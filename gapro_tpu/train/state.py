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
            opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = self.tx.update(grads, opt_state, self.params)
        params = optax.apply_updates(self.params, updates)
        return self.replace(
            params=params,
            batch_stats=new_batch_stats if new_batch_stats is not None else self.batch_stats,
            opt_state=opt_state,
            step=self.step + 1,
        )


def create_train_state(variables, lr=1e-3, weight_decay=1e-4) -> TrainState:
    tx = optax.inject_hyperparams(optax.adamw)(learning_rate=lr, weight_decay=weight_decay)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
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
