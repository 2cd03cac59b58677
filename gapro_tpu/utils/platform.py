"""Platform selection guard.

This machine's interpreter boot hook registers a remote "axon" TPU backend
and force-sets jax_platforms to "axon,cpu", overriding the JAX_PLATFORMS env
var. CLI tools call :func:`honor_env_platform` before the first jax
operation so `JAX_PLATFORMS=cpu python tools/train.py ...` actually runs on
local CPU (and the default TPU path is untouched when the env var is unset).
"""

from __future__ import annotations

import os


def honor_env_platform() -> None:
    env = os.environ.get("JAX_PLATFORMS", "")
    if not env:
        return
    import jax

    if not jax._src.xla_bridge.backends_are_initialized():
        jax.config.update("jax_platforms", env)
