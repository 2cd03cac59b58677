"""Trainer-completion features (VERDICT round-1 #2):

  * fixed_modules freezing — optimizer updates zeroed AND BatchNorm eval
    semantics for frozen modules (the parity trap, reference
    isbnet.py:168-176, 219-225);
  * PolyLR schedule values (SPFormer's scheduler);
  * DP step weighted reductions — a zero-weight filler shard must not
    change the update (VERDICT weak #7);
  * end-to-end: tools/train.py writes `best` + per-loss metrics + val
    metrics on a synthetic run.
"""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gapro_tpu.losses.criterion import CriterionConfig
from gapro_tpu.models import ISBNet, ISBNetConfig
from gapro_tpu.train.state import create_train_state, poly_lr
from gapro_tpu.train.step import make_dp_train_step, make_train_step

from tests.test_isbnet_forward import _make_prepared, _tiny_cfg

FROZEN = ("input_conv", "unet", "output_layer", "semantic_linear",
          "offset_vertices_linear", "box_conf_linear")


def _cfg(**kw):
    base = {**_tiny_cfg().__dict__, "filter_bg_thresh": 0.0}
    base.update(kw)
    return ISBNetConfig(**base)


@pytest.mark.slow
def test_fixed_modules_grads_zero_and_bn_frozen():
    model = ISBNet(_cfg(fixed_modules=FROZEN))
    prepared = _make_prepared()
    variables = model.init(jax.random.PRNGKey(0), prepared.batch, False)
    state = create_train_state(variables, fixed_modules=FROZEN)
    step = make_train_step(model, CriterionConfig(inst_cap=16))

    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    bs0 = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    state, losses = step(state, prepared, jnp.float32(1e-2))
    assert np.isfinite(float(losses["loss"]))

    frozen_keys = {"backbone", "semantic_linear", "offset_vertices_linear",
                   "box_conf_linear"}
    for key in state.params:
        before = jax.tree_util.tree_leaves(p0[key])
        after = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, state.params[key]))
        changed = any(not np.array_equal(a, b) for a, b in zip(before, after))
        if key in frozen_keys:
            assert not changed, f"frozen module {key} params changed"
        else:
            assert changed, f"trainable module {key} params did not change"

    # BN eval semantics: frozen modules must NOT update running stats even
    # in train mode (isbnet.py:219-225)
    for key in frozen_keys & set(bs0.keys()):
        before = jax.tree_util.tree_leaves(bs0[key])
        after = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, state.batch_stats[key]))
        for a, b in zip(before, after):
            np.testing.assert_array_equal(a, b, err_msg=f"{key} BN stats moved")
    # a trainable module's BN stats DO move
    moved = False
    for key in set(bs0.keys()) - frozen_keys:
        before = jax.tree_util.tree_leaves(bs0[key])
        after = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, state.batch_stats[key]))
        moved |= any(not np.array_equal(a, b) for a, b in zip(before, after))
    assert moved


def test_poly_lr_values():
    assert poly_lr(2e-4, 0, 512) == 2e-4
    assert poly_lr(2e-4, 512, 512) == 0.0
    mid = poly_lr(2e-4, 256, 512)
    assert abs(mid - 2e-4 * 0.5 ** 0.9) < 1e-12


@pytest.mark.slow
def test_dp_weighted_filler_shard():
    """[sceneA, sceneA] with weights [1, 0] must equal weights [1, 1]
    (identical duplicated shards) AND differ from a two-distinct-scene step."""
    if jax.device_count() < 2:
        import pytest

        pytest.skip("needs 2 devices")
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:2]), ("dp",))
    model = ISBNet(_cfg())
    crit = CriterionConfig(inst_cap=16)
    a = _make_prepared(seed=0)
    b = _make_prepared(seed=1)
    dup = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), a, a)
    mix = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), a, b)
    variables = model.init(jax.random.PRNGKey(0), a.batch, False)

    def run(stacked, w):
        # donate_argnums on the step consumes the state buffers; each run
        # needs its own copy of the shared init variables
        state = create_train_state(
            jax.tree_util.tree_map(jnp.array, variables))
        step = make_dp_train_step(model, crit, mesh)
        state, losses = step(state, stacked, jnp.float32(1e-3),
                             jnp.asarray(w, jnp.float32))
        return (jax.tree_util.tree_map(np.asarray, state.params),
                float(losses["loss"]))

    p_w10, l_w10 = run(dup, [1.0, 0.0])
    p_w11, l_w11 = run(dup, [1.0, 1.0])
    p_mix, l_mix = run(mix, [1.0, 1.0])

    # same scene duplicated: weighting must not matter
    assert abs(l_w10 - l_w11) < 1e-5
    for x, y in zip(jax.tree_util.tree_leaves(p_w10),
                    jax.tree_util.tree_leaves(p_w11)):
        np.testing.assert_allclose(x, y, atol=1e-6)
    # a genuinely different second scene must change the update
    diff = any(not np.allclose(x, y, atol=1e-7) for x, y in
               zip(jax.tree_util.tree_leaves(p_w10),
                   jax.tree_util.tree_leaves(p_mix)))
    assert diff


@pytest.mark.slow
def test_train_cli_best_checkpoint_and_meters(tmp_path):
    """tools/train.py end to end on synthetic data: per-loss meters in
    metrics.jsonl, validation metrics, and a `best` checkpoint."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    work = str(tmp_path / "run")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "train.py"),
         os.path.join(repo, "configs", "tiny_synthetic.yaml"),
         "--synthetic", "2", "--epochs", "1", "--work_dir", work,
         "--val_scenes", "1"],
        capture_output=True, text=True, env=env, cwd=repo, timeout=1500)
    assert r.returncode == 0, r.stderr[-3000:]
    lines = [json.loads(x) for x in open(os.path.join(work, "metrics.jsonl"))]
    rec = lines[-1]
    # per-loss meters
    for k in ("dice_loss", "bce_loss", "cls_loss", "loss"):
        assert k in rec, rec
    # validation ran at epoch 1 (power of two) and produced the metrics
    assert "val_ap" in rec, rec
    # best checkpoint written (first validation is always an improvement)
    assert os.path.isdir(os.path.join(work, "best"))


def test_profiling_module():
    """profiling.trace/annotate must work (or degrade gracefully) on CPU."""
    import os
    import tempfile

    import jax.numpy as jnp

    from gapro_tpu.utils import profiling

    with tempfile.TemporaryDirectory() as d:
        with profiling.trace(os.path.join(d, "tr")):
            with profiling.annotate("op"):
                r = jnp.sum(jnp.ones((64, 64)) * 2.0)
        assert float(r) == 64 * 64 * 2
    stats = profiling.device_memory_stats()
    assert isinstance(stats, dict)


def test_visualization_html_export(tmp_path):
    """--format html: self-contained viewer with correctly-sized payloads."""
    import base64
    import re
    import sys

    sys.path.insert(0, "tools")
    import visualization as vz

    xyz = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    rgb = np.random.default_rng(1).integers(0, 255, (100, 3)).astype(np.uint8)
    out = str(tmp_path / "scene.html")
    vz.write_html(out, xyz, rgb, title="t")
    html = open(out).read()
    assert "{{" not in html  # template fully resolved
    xyz_b64 = re.search(r'Float32Array\.from\(atob\("([^"]*)"', html).group(1)
    rgb_b64 = re.search(r'Uint8Array\.from\(atob\("([^"]*)"', html).group(1)
    assert len(base64.b64decode(xyz_b64)) == 100 * 3 * 4
    assert len(base64.b64decode(rgb_b64)) == 100 * 3


def test_visualization_pred_modes(tmp_path, monkeypatch):
    """semantic_pred / offset_semantic_pred / offset_vertices_pred view
    modes (reference visualization.py:345-383,505) consume the
    --save_pointwise .npy layout and export PLY/HTML."""
    import sys as _sys

    _sys.path.insert(0, "tools")
    import visualization as vz

    from gapro_tpu.data import make_synthetic_scene

    s = make_synthetic_scene(seed=0)
    n = len(s.xyz)
    scan = "synthetic0000"
    pred = tmp_path / "preds"
    rng = np.random.default_rng(0)
    (pred / "semantic_pred").mkdir(parents=True)
    (pred / "offset_pred").mkdir()
    (pred / "offset_vertices_pred").mkdir()
    np.save(pred / "semantic_pred" / f"{scan}.npy",
            rng.integers(0, 18, n).astype(np.int32))
    np.save(pred / "offset_pred" / f"{scan}.npy",
            rng.normal(0, 0.05, (n, 3)).astype(np.float32))
    np.save(pred / "offset_vertices_pred" / f"{scan}.npy",
            np.concatenate([np.full((n, 3), -0.2), np.full((n, 3), 0.2)],
                           axis=1).astype(np.float32))

    for task in ("semantic_pred", "offset_semantic_pred",
                 "offset_vertices_pred"):
        monkeypatch.setattr(_sys, "argv", [
            "visualization.py", "--synthetic", "1", "--task", task,
            "--prediction_path", str(pred), "--out", str(tmp_path / "vis"),
            "--format", "ply"])
        vz.main()
        out = tmp_path / "vis" / f"{scan}_{task}.ply"
        assert out.exists()
        header = out.read_text().splitlines()[:4]
        n_out = int(header[2].split()[-1])
        # the boxes mode appends edge-sampled wireframe points
        assert n_out >= n if task == "offset_vertices_pred" else n_out == n
