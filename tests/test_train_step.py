import jax
import jax.numpy as jnp
import numpy as np

from gapro_tpu.losses.criterion import CriterionConfig
from gapro_tpu.models import ISBNet
from gapro_tpu.train.state import cosine_lr_after_step, create_train_state
from gapro_tpu.train.step import make_dp_train_step, make_train_step

from tests.test_isbnet_forward import _make_prepared, _tiny_cfg
import pytest


def _cfg():
    return _tiny_cfg().__class__(**{**_tiny_cfg().__dict__, "filter_bg_thresh": 0.0})


@pytest.mark.slow
def test_single_device_step_decreases_loss():
    model = ISBNet(_cfg())
    prepared = _make_prepared()
    variables = model.init(jax.random.PRNGKey(0), prepared.batch, False)
    state = create_train_state(variables)
    step = make_train_step(model, CriterionConfig(inst_cap=16))
    history = []
    for _ in range(8):
        state, losses = step(state, prepared, jnp.float32(1e-3))
        assert np.isfinite(float(losses["loss"]))
        history.append(float(losses["loss"]))
    # overfitting one batch: the tail must improve on the start (loose
    # bound — early steps can spike while BN stats settle)
    assert min(history[4:]) < history[0] + 0.5
    assert int(state.step) == 8


@pytest.mark.slow
def test_dp_step_matches_devices():
    n_dev = min(4, jax.device_count())
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("dp",))
    model = ISBNet(_cfg())
    shards = [_make_prepared(seed=i) for i in range(n_dev)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *shards)
    variables = model.init(jax.random.PRNGKey(0), shards[0].batch, False)
    state = create_train_state(variables)
    step = make_dp_train_step(model, CriterionConfig(inst_cap=16), mesh)
    state, losses = step(state, stacked, jnp.float32(1e-3))
    assert np.isfinite(float(losses["loss"]))
    # params stay replicated across the mesh after the update
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()


def test_cosine_lr():
    assert cosine_lr_after_step(1e-3, 0, 100, 120) == 1e-3
    assert cosine_lr_after_step(1e-3, 99, 100, 120) == 1e-3
    end = cosine_lr_after_step(1e-3, 120, 100, 120)
    assert end < 2e-6


def test_checkpoint_roundtrip(tmp_path):
    from gapro_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    tree = dict(a=np.arange(6, dtype=np.float32).reshape(2, 3),
                b=dict(c=np.float32(2.5)))
    save_checkpoint(str(tmp_path), tree, epoch=1)
    save_checkpoint(str(tmp_path), tree, epoch=2)
    got = load_checkpoint(str(tmp_path / "latest"))
    np.testing.assert_array_equal(got["a"], tree["a"])

    # partial restore: mismatched shape keeps the target leaf
    target = dict(a=np.zeros((4, 3), np.float32), b=dict(c=np.float32(0.0)))
    merged = load_checkpoint(str(tmp_path / "latest"), target)
    assert merged["a"].shape == (4, 3)
    assert float(merged["b"]["c"]) == 2.5


@pytest.mark.slow
def test_train_step_bf16_mode(monkeypatch):
    """GAPRO_CONV_DTYPE=bf16: the train step must stay finite and land near
    the fp32 loss (bf16 tables halve conv HBM traffic; AMP-fp16 analog of
    ISBNet/tools/train.py:79-82)."""

    def one_step():
        model = ISBNet(_cfg())
        prepared = _make_prepared()
        variables = model.init(jax.random.PRNGKey(0), prepared.batch, False)
        state = create_train_state(variables)
        step = make_train_step(model, CriterionConfig(inst_cap=16))
        _, losses = step(state, prepared, jnp.float32(1e-3))
        return float(losses["loss"])

    monkeypatch.setenv("GAPRO_CONV_DTYPE", "bf16")
    loss_bf16 = one_step()
    assert np.isfinite(loss_bf16)
    monkeypatch.delenv("GAPRO_CONV_DTYPE")
    loss_fp32 = one_step()
    # same data/init; dtype is the only difference
    assert abs(loss_bf16 - loss_fp32) < 0.3
