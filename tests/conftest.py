"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes backends (SURVEY.md §4:
multi-device tests use XLA's host-platform device-count trick).

Note: this machine's interpreter boot hook (sitecustomize) registers a
remote "axon" TPU backend and force-sets jax_platforms to "axon,cpu",
overriding the JAX_PLATFORMS env var.  Tests must be deterministic local
CPU — remote compiles/executions through the tunnel are intermittently
minutes-slow — so we out-vote it with jax.config.update *after* import,
which is still before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

assert not jax._src.xla_bridge.backends_are_initialized() or all(
    d.platform == "cpu" for d in jax.devices()
), "jax backends initialized before conftest could force CPU"
