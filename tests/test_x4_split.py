import jax
import jax.numpy as jnp
import numpy as np

from gapro_tpu.data import make_synthetic_scene, remap_semantic_for_training
from gapro_tpu.models import ISBNet
from gapro_tpu.models.prepare import points_to_batch_np, prepare_voxel_batch

from tests.test_isbnet_forward import _tiny_cfg
import pytest


def _scene_dict(seed=0):
    s = make_synthetic_scene(seed=seed, n_objects=3, points_per_object=300,
                             n_floor=400, n_wall=300)
    sem = remap_semantic_for_training(s.semantic_label)
    return dict(xyz=s.xyz, rgb=s.rgb, spp=s.spp, semantic=sem,
                instance=s.instance_label)


def _interleave_pieces(scene, n_pieces=4):
    order = np.argsort(scene["xyz"][:, 0], kind="stable")
    return [
        {k: v[order[p::n_pieces]] for k, v in scene.items()}
        for p in range(n_pieces)
    ], order


def _prep(scenes, batch_size, nb=3):
    pb = points_to_batch_np(scenes, voxel_scale=10)
    pbj = jax.tree_util.tree_map(jnp.asarray, pb)
    return prepare_voxel_batch(pbj, pb.coords.shape[0], batch_size, nb, 256, 0.7)


def _voxel_rows(prepared):
    """(batch, z, y, x) -> row index for every valid voxel."""
    grid = prepared.batch.plan.levels[0].grid
    coords = np.asarray(grid.coords)
    nv = int(grid.num_voxels)
    return {tuple(c): i for i, c in enumerate(coords[:nv])}


@pytest.mark.slow
def test_x4_split_inference_runs():
    """4 interleaved pieces as batch items -> merged single-scene heads
    (reference forward_4_parts, isbnet.py:703-722)."""
    s = make_synthetic_scene(seed=0, n_objects=3, points_per_object=300,
                             n_floor=400, n_wall=300)
    sem = remap_semantic_for_training(s.semantic_label)
    order = np.argsort(s.xyz[:, 0], kind="stable")
    pieces = []
    for p in range(4):
        idx = order[p::4]
        pieces.append(dict(xyz=s.xyz[idx], rgb=s.rgb[idx], spp=s.spp[idx],
                           semantic=sem[idx], instance=s.instance_label[idx]))
    pb = points_to_batch_np(pieces, voxel_scale=10)
    pbj = jax.tree_util.tree_map(jnp.asarray, pb)
    prepared = prepare_voxel_batch(pbj, pb.coords.shape[0], 4, 3, 256, 0.7)

    cfg = _tiny_cfg().__class__(**{**_tiny_cfg().__dict__, "filter_bg_thresh": 0.0})
    model = ISBNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), prepared.batch, False)
    out = model.apply(
        variables, prepared.batch,
        method=lambda m, b: m.forward_inference(b, (8, 4), x4_split=True),
    )
    # merged scene: single batch row of proposals over ALL pieces' superpoints
    assert out["cls_logits"].shape[0] == 1
    assert np.isfinite(np.asarray(out["mask_logits"])).all()
    assert int(out["query_valid"].sum()) > 0


@pytest.mark.slow
def test_x4_split_equivalence_vs_unsplit():
    """Split semantics, not just shapes (VERDICT r3 #6): with 4 identical
    copies of a scene as the pieces, each piece voxelizes to EXACTLY the
    unsplit scene's voxel set, so the x4 path's per-voxel trunk outputs
    (semantic scores / box conf — computed before any merge) must match the
    unsplit run's at coordinate-matched voxels. This is the reference
    equivalence: forward_4_parts (isbnet.py:703-722) runs the same backbone
    per piece that a lone scene would get."""
    scene = _scene_dict(seed=1)
    cfg = _tiny_cfg().__class__(**{**_tiny_cfg().__dict__, "filter_bg_thresh": 0.0})
    model = ISBNet(cfg)

    prep1 = _prep([scene], 1)
    variables = model.init(jax.random.PRNGKey(0), prep1.batch, False)
    out1 = model.apply(variables, prep1.batch,
                       method=lambda m, b: m.forward_inference(b, (8, 4)))
    rows1 = _voxel_rows(prep1)
    sem1 = np.asarray(out1["semantic_scores"])
    conf1 = np.asarray(out1["box_conf"])

    prep4 = _prep([scene] * 4, 4)
    out4 = model.apply(
        variables, prep4.batch,
        method=lambda m, b: m.forward_inference(b, (8, 4), x4_split=True))
    sem4 = np.asarray(out4["semantic_scores"])
    conf4 = np.asarray(out4["box_conf"])

    grid4 = prep4.batch.plan.levels[0].grid
    coords4 = np.asarray(grid4.coords)[: int(grid4.num_voxels)]
    assert len(coords4) == 4 * len(rows1)  # identical copies: same voxel set x4
    matched = 0
    for i, c in enumerate(coords4):
        j = rows1[(0, c[1], c[2], c[3])]  # same (z,y,x), unsplit batch row 0
        np.testing.assert_allclose(sem4[i], sem1[j], rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(conf4[i], conf1[j], rtol=2e-3, atol=2e-3)
        matched += 1
    assert matched == len(coords4)

    # merged head path produced usable proposals over the merged spp axis
    assert out4["cls_logits"].shape[0] == 1
    assert int(out4["query_valid"].sum()) > 0


@pytest.mark.slow
def test_x4_split_backbone_batch_independence():
    """Real interleaved pieces: piece 0's voxel outputs inside the 4-piece
    batch equal piece 0 run ALONE (batch 1) — rulebooks must never cross
    batch ids, the property the reference gets by looping pieces
    (forward_4_parts)."""
    scene = _scene_dict(seed=2)
    pieces, _ = _interleave_pieces(scene)
    cfg = _tiny_cfg().__class__(**{**_tiny_cfg().__dict__, "filter_bg_thresh": 0.0})
    model = ISBNet(cfg)

    prep4 = _prep(pieces, 4)
    variables = model.init(jax.random.PRNGKey(0), prep4.batch, False)
    out4 = model.apply(variables, prep4.batch,
                       method=lambda m, b: m.forward_inference(b, (8, 4),
                                                               x4_split=True))
    prep0 = _prep([pieces[0]], 1)
    out0 = model.apply(variables, prep0.batch,
                       method=lambda m, b: m.forward_inference(b, (8, 4)))

    rows0 = _voxel_rows(prep0)
    grid4 = prep4.batch.plan.levels[0].grid
    coords4 = np.asarray(grid4.coords)[: int(grid4.num_voxels)]
    sem4 = np.asarray(out4["semantic_scores"])
    sem0 = np.asarray(out0["semantic_scores"])
    n_checked = 0
    for i, c in enumerate(coords4):
        if c[0] != 0:  # piece 0 only
            continue
        j = rows0[(0, c[1], c[2], c[3])]
        np.testing.assert_allclose(sem4[i], sem0[j], rtol=2e-3, atol=2e-3)
        n_checked += 1
    assert n_checked == len(rows0)


def test_x4_merge_order_roundtrip():
    """The test CLI's perm/inv unscramble == the reference merge_4_parts
    semantics (isbnet.py:688-701): piece-concatenated per-point values
    return to original scene order."""
    rng = np.random.default_rng(0)
    n = 1003  # not divisible by 4
    x = rng.random(n).astype(np.float32)
    xcoord = rng.random(n).astype(np.float32)

    order = np.argsort(xcoord, kind="stable")
    perm = np.concatenate([order[p::4] for p in range(4)])
    piece_concat = x[perm]

    # reference oracle (merge_4_parts): x_new[inds[i::4]] = chunk i, where
    # the piece index sets partition `order`
    ref = np.empty_like(x)
    off = 0
    for p in range(4):
        idx = order[p::4]
        ref[idx] = piece_concat[off:off + len(idx)]
        off += len(idx)

    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    np.testing.assert_array_equal(piece_concat[inv], ref)
    np.testing.assert_array_equal(piece_concat[inv], x)
