"""Training state: params + batch stats + AdamW, reference schedule.

Optimizer: AdamW lr 1e-3, weight_decay 1e-4
(ISBNet/configs/scannetv2/boxsup_isbnet_scannetv2.yaml:67-70).
LR schedule: constant until ``step_epoch``, then cosine to ``clip``
(ISBNet/isbnet/util/utils.py:54-61 `cosine_lr_after_step`); LR is passed
per-step via optax schedule-by-state (we feed the epoch-based LR through
``optax.inject_hyperparams``).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.struct
import jax
import optax


def cosine_lr_after_step(base_lr, epoch, step_epoch, total_epochs, clip=1e-6):
    if epoch < step_epoch:
        return base_lr
    t = (epoch - step_epoch) / max(total_epochs - step_epoch, 1)
    return clip + 0.5 * (base_lr - clip) * (1 + math.cos(math.pi * t))


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None, lr=None):
        opt_state = self.opt_state
        if lr is not None:
            # inject_hyperparams state is the root, or the first link when
            # wrapped in a chain (frozen-module masking)
            hp = opt_state if hasattr(opt_state, "hyperparams") else opt_state[0]
            hp.hyperparams["learning_rate"] = lr
        updates, opt_state = self.tx.update(grads, opt_state, self.params)
        params = optax.apply_updates(self.params, updates)
        return self.replace(
            params=params,
            batch_stats=new_batch_stats if new_batch_stats is not None else self.batch_stats,
            opt_state=opt_state,
            step=self.step + 1,
        )


# reference fixed_modules names -> our top-level flax param keys
# (input_conv/unet/output_layer live inside our single `backbone` module)
_FIXED_NAME_MAP = {
    "input_conv": "backbone",
    "unet": "backbone",
    "output_layer": "backbone",
    "offset_linear": "offset_vertices_linear",
}


def fixed_param_keys(fixed_modules) -> frozenset:
    return frozenset(_FIXED_NAME_MAP.get(m, m) for m in fixed_modules)


def create_train_state(variables, lr=1e-3, weight_decay=1e-4,
                       fixed_modules=()) -> TrainState:
    """AdamW with per-step injected LR; `fixed_modules` (reference names or
    our top-level keys, isbnet.py:168-176) get their updates zeroed —
    together with the model-side BN-eval/stop_gradient this freezes them."""
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.inject_hyperparams(optax.adamw)(learning_rate=lr, weight_decay=weight_decay)
    if fixed_modules:
        frozen = fixed_param_keys(fixed_modules)
        missing = frozen - set(params.keys())
        if missing:
            raise ValueError(f"fixed_modules not in params: {sorted(missing)}")
        mask = {k: (k in frozen) for k in params.keys()}
        tx = optax.chain(tx, optax.masked(optax.set_to_zero(), mask))
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jax.numpy.zeros((), jax.numpy.int32),
        tx=tx,
    )


def poly_lr(base_lr, epoch, max_epochs, power: float = 0.9):
    """PolyLR (SPFormer's gorilla scheduler, SPFormer/configs/
    boxsup_spf_scannet.yaml:103-106): base * (1 - e/max)^power."""
    return base_lr * max(1.0 - epoch / max(max_epochs, 1), 0.0) ** power
