"""Checkpoint-converter tests.

1. A fake reference-shaped torch state_dict (spconv2 KRSC layouts, exact key
   names per ISBNet/isbnet/model/isbnet.py:89-209) converts to a flax
   variable tree that matches ISBNet.init's tree exactly (paths + shapes).
2. Backbone activation parity: converted weights through our sparse U-Net
   reproduce a from-scratch dense numpy oracle of the reference backbone
   (pre-act residual blocks, stride-2 down / inverse up with shared
   rulebooks, BN eval with running stats) on the same voxel set.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))

from convert_torch_ckpt import convert_state_dict  # noqa: E402

from gapro_tpu.data import make_synthetic_scene  # noqa: E402
from gapro_tpu.models import ISBNet, ISBNetConfig  # noqa: E402
from gapro_tpu.models.prepare import points_to_batch_np, prepare_voxel_batch  # noqa: E402
from gapro_tpu.sparse.unet import SparseUNetBackbone  # noqa: E402
import pytest

C, NB, DD, M = 8, 3, 32, 8
IN_CH = 6


def _fake_state_dict(rng, C=C, NB=NB, DD=DD, M=M, n_cls=19):
    sd = {}

    def w(key, *shape):
        sd[key] = rng.standard_normal(shape).astype(np.float32) * 0.2

    def bn(prefix, n):
        w(f"{prefix}.weight", n)
        sd[f"{prefix}.weight"] += 1.0  # scale ~ 1
        w(f"{prefix}.bias", n)
        w(f"{prefix}.running_mean", n)
        sd[f"{prefix}.running_var"] = (
            rng.random(n).astype(np.float32) * 0.5 + 0.75)
        sd[f"{prefix}.num_batches_tracked"] = np.asarray(10)

    def res_block(prefix, cin, cout):
        bn(f"{prefix}.conv_branch.0", cin)
        w(f"{prefix}.conv_branch.2.weight", cout, 3, 3, 3, cin)  # KRSC
        bn(f"{prefix}.conv_branch.3", cout)
        w(f"{prefix}.conv_branch.5.weight", cout, 3, 3, 3, cout)
        if cin != cout:
            w(f"{prefix}.i_branch.0.weight", cout, 1, 1, 1, cin)

    def unet(prefix, planes):
        p0 = planes[0]
        for i in range(2):
            res_block(f"{prefix}.blocks.block{i}", p0, p0)
        if len(planes) > 1:
            p1 = planes[1]
            bn(f"{prefix}.conv.0", p0)
            w(f"{prefix}.conv.2.weight", p1, 2, 2, 2, p0)
            unet(f"{prefix}.u", planes[1:])
            bn(f"{prefix}.deconv.0", p1)
            w(f"{prefix}.deconv.2.weight", p0, 2, 2, 2, p1)
            res_block(f"{prefix}.blocks_tail.block0", 2 * p0, p0)
            res_block(f"{prefix}.blocks_tail.block1", p0, p0)

    def mlp(prefix, cin, cout, num_layers):
        ti = 0
        for _ in range(num_layers - 1):
            w(f"{prefix}.{ti}.weight", cin, cin)
            w(f"{prefix}.{ti}.bias", cin)
            bn(f"{prefix}.{ti + 1}", cin)
            ti += 3
        w(f"{prefix}.{ti}.weight", cout, cin)
        w(f"{prefix}.{ti}.bias", cout)

    def shared_mlp(prefix, dims):
        for i in range(len(dims) - 1):
            w(f"{prefix}.layer{i}.conv.weight", dims[i + 1], dims[i], 1, 1)
            bn(f"{prefix}.layer{i}.bn.bn", dims[i + 1])

    def aggregator(prefix, d):
        shared_mlp(f"{prefix}.mlp_module1", [d + 6, d, 2 * d])
        shared_mlp(f"{prefix}.mlp_module2", [2 * d + 6, 2 * d])
        w(f"{prefix}.mlp_module3.0.conv.weight", 8 * d, 2 * d, 1)
        bn(f"{prefix}.mlp_module3.0.bn.bn", 8 * d)
        w(f"{prefix}.mlp_module3.1.conv.weight", 2 * d, 8 * d, 1)
        bn(f"{prefix}.mlp_module3.1.bn.bn", 2 * d)

    def generic(prefix, cin, hidden, cout, out_norm=False):
        ti = 0
        prev = cin
        for h in hidden:
            w(f"{prefix}.layers.{ti}.weight", h, prev, 1)
            bn(f"{prefix}.layers.{ti + 1}", h)
            prev = h
            ti += 3
        w(f"{prefix}.layers.{ti}.weight", cout, prev, 1)
        w(f"{prefix}.layers.{ti}.bias", cout)
        if out_norm:
            bn(f"{prefix}.layers.{ti + 1}", cout)

    w("input_conv.0.weight", C, 3, 3, 3, IN_CH)
    unet("unet", [C * (i + 1) for i in range(NB)])
    bn("output_layer.0", C)
    mlp("semantic_linear", C, n_cls, 2)
    mlp("offset_vertices_linear", C, 6, 2)
    mlp("box_conf_linear", C, 1, 2)
    mlp("mu_linear", C, 1, 3)
    mlp("logvar_linear", C, 1, 3)
    aggregator("point_aggregator1", C)
    aggregator("point_aggregator2", 2 * C)
    generic("inst_shared_mlp", 4 * C, [4 * C], DD, out_norm=True)
    generic("inst_sem_head", DD, [DD, DD], n_cls)
    generic("inst_conf_head", DD, [DD, DD], 1)
    generic("inst_box_head", DD, [DD, DD], 6)
    for i in range(3):
        w(f"mask_tower.{i}.0.conv.weight", C, C, 1)
        bn(f"mask_tower.{i}.1", C)
    w("mask_tower.3.weight", M, C, 1)
    w("mask_tower.3.bias", M)
    for i in range(2):
        w(f"inst_mask_head.{i}.0.conv.weight", DD, DD, 1)
        bn(f"inst_mask_head.{i}.1", DD)
    num_gen = (M + 6) * M + M * (M // 2) + (M // 2) + M + (M // 2) + 1
    w("inst_mask_head.2.weight", num_gen, DD, 1)
    w("inst_mask_head.2.bias", num_gen)
    return sd


def _tiny_cfg():
    return ISBNetConfig(channels=C, num_blocks=NB, n_sample_pa1=64, n_queries=16,
                        neighbor=8, dec_dim=DD, mask_dim_out=M, spp_cap=256)


def _prepared(seed=0, nb=NB):
    s = make_synthetic_scene(seed=seed, n_objects=3, points_per_object=200,
                             n_floor=300, n_wall=200)
    pb = points_to_batch_np(
        [dict(xyz=s.xyz, rgb=s.rgb, spp=s.spp, semantic=s.semantic_label,
              instance=s.instance_label)], voxel_scale=10)
    return prepare_voxel_batch(jax.tree_util.tree_map(jnp.asarray, pb),
                               pb.coords.shape[0], 1, nb, 256, 0.7)


def _paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(v.shape)
    return out


@pytest.mark.slow
def test_convert_tree_matches_init():
    rng = np.random.default_rng(0)
    sd = _fake_state_dict(rng)
    variables, report = convert_state_dict(sd)
    assert report["missing_torch_keys"] == []
    assert report["unused_torch_keys"] == []
    assert report["n_levels"] == NB

    prepared = _prepared()
    model = ISBNet(_tiny_cfg())
    init_vars = model.init(jax.random.PRNGKey(0), prepared.batch, False)

    got_p = _paths(variables["params"])
    want_p = _paths(jax.tree_util.tree_map(np.asarray, init_vars["params"]))
    assert got_p == want_p, (
        sorted(set(want_p) - set(got_p))[:5], sorted(set(got_p) - set(want_p))[:5])
    got_s = _paths(variables["batch_stats"])
    want_s = _paths(jax.tree_util.tree_map(np.asarray, init_vars["batch_stats"]))
    assert got_s == want_s

    # converted weights must actually run
    out = model.apply(variables, prepared.batch, False)
    assert np.isfinite(np.asarray(out["mask_logits"])).all()


@pytest.mark.slow
def test_convert_tree_matches_init_fullsize():
    """Released-checkpoint geometry (VERDICT r2 #5): C=32, 7 U-Net levels,
    dec_dim 128, mask dim 32, ALL heads present — the converter must map
    every torch key ([unused] report empty) and hit every flax param
    ([MISSING] report empty) with exactly matching shapes."""
    rng = np.random.default_rng(1)
    sd = _fake_state_dict(rng, C=32, NB=7, DD=128, M=32)
    variables, report = convert_state_dict(sd)
    assert report["missing_torch_keys"] == []
    assert report["unused_torch_keys"] == []
    assert report["n_levels"] == 7

    prepared = _prepared(nb=7)
    model = ISBNet(ISBNetConfig(channels=32, num_blocks=7, n_sample_pa1=64,
                                n_queries=16, neighbor=8, dec_dim=128,
                                mask_dim_out=32, spp_cap=256))
    init_vars = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), prepared.batch, False)

    got_p = _paths(variables["params"])
    want_p = _paths(jax.tree_util.tree_map(np.asarray, init_vars["params"]))
    assert got_p == want_p, (
        sorted(set(want_p) - set(got_p))[:5], sorted(set(got_p) - set(want_p))[:5])
    got_s = _paths(variables["batch_stats"])
    want_s = _paths(jax.tree_util.tree_map(np.asarray, init_vars["batch_stats"]))
    assert got_s == want_s


# --------------------------------------------------------------------------- #
# dense numpy oracle of the reference backbone
# --------------------------------------------------------------------------- #


def _oracle_bn(sd, prefix, x):
    w = sd[f"{prefix}.weight"]
    b = sd[f"{prefix}.bias"]
    rm = sd[f"{prefix}.running_mean"]
    rv = sd[f"{prefix}.running_var"]
    return (x - rm) / np.sqrt(rv + 1e-4) * w + b


def _oracle_subm(x, w_krsc, coords, pos):
    """out[p] = sum_k W_k @ x[p + (k-1)] over active neighbors."""
    V = len(coords)
    out = np.zeros((V, w_krsc.shape[0]), np.float32)
    for kz in range(3):
        for ky in range(3):
            for kx in range(3):
                Wk = w_krsc[:, kz, ky, kx, :]  # (out, in)
                for v in range(V):
                    nb = pos.get((coords[v][0] + kz - 1, coords[v][1] + ky - 1,
                                  coords[v][2] + kx - 1))
                    if nb is not None:
                        out[v] += x[nb] @ Wk.T
    return out


def _oracle_res_block(sd, prefix, x, coords, pos):
    if f"{prefix}.i_branch.0.weight" in sd:
        wi = sd[f"{prefix}.i_branch.0.weight"]
        identity = x @ wi.reshape(wi.shape[0], -1).T
    else:
        identity = x
    y = np.maximum(_oracle_bn(sd, f"{prefix}.conv_branch.0", x), 0.0)
    y = _oracle_subm(y, sd[f"{prefix}.conv_branch.2.weight"], coords, pos)
    y = np.maximum(_oracle_bn(sd, f"{prefix}.conv_branch.3", y), 0.0)
    y = _oracle_subm(y, sd[f"{prefix}.conv_branch.5.weight"], coords, pos)
    return y + identity


def _oracle_unet(sd, prefix, x, coords, n_planes):
    coords_t = [tuple(c) for c in coords]
    pos = {c: i for i, c in enumerate(coords_t)}
    for i in range(2):
        x = _oracle_res_block(sd, f"{prefix}.blocks.block{i}", x, coords_t, pos)
    if n_planes == 1:
        return x
    identity = x

    # stride-2 down: out site q gathers children 2q + k
    y = np.maximum(_oracle_bn(sd, f"{prefix}.conv.0", x), 0.0)
    coarse = np.unique(coords // 2, axis=0)
    cpos = {tuple(c): i for i, c in enumerate(coarse)}
    wd = sd[f"{prefix}.conv.2.weight"]  # (out, 2,2,2, in)
    z = np.zeros((len(coarse), wd.shape[0]), np.float32)
    for v, c in enumerate(coords_t):
        q = cpos[(c[0] // 2, c[1] // 2, c[2] // 2)]
        Wk = wd[:, c[0] % 2, c[1] % 2, c[2] % 2, :]
        z[q] += y[v] @ Wk.T

    z = _oracle_unet(sd, f"{prefix}.u", z, coarse, n_planes - 1)

    # inverse conv: fine site v gathers its parent with its own tap
    z = np.maximum(_oracle_bn(sd, f"{prefix}.deconv.0", z), 0.0)
    wu = sd[f"{prefix}.deconv.2.weight"]  # (out, 2,2,2, in)
    up = np.zeros((len(coords_t), wu.shape[0]), np.float32)
    for v, c in enumerate(coords_t):
        q = cpos[(c[0] // 2, c[1] // 2, c[2] // 2)]
        Wk = wu[:, c[0] % 2, c[1] % 2, c[2] % 2, :]
        up[v] = z[q] @ Wk.T

    x = np.concatenate([identity, up], axis=1)
    for i in range(2):
        x = _oracle_res_block(sd, f"{prefix}.blocks_tail.block{i}", x, coords_t, pos)
    return x


def _oracle_backbone(sd, coords, feats):
    coords_t = [tuple(c) for c in coords]
    pos = {c: i for i, c in enumerate(coords_t)}
    x = _oracle_subm(feats, sd["input_conv.0.weight"], coords_t, pos)
    x = _oracle_unet(sd, "unet", x, coords, NB)
    return np.maximum(_oracle_bn(sd, "output_layer.0", x), 0.0)


def test_backbone_activation_parity_vs_oracle():
    rng = np.random.default_rng(1)
    sd = _fake_state_dict(rng)
    variables, _ = convert_state_dict(sd)
    bb_vars = {"params": variables["params"]["backbone"],
               "batch_stats": variables["batch_stats"]["backbone"]}

    prepared = _prepared(seed=3)
    batch = prepared.batch
    grid = batch.plan.levels[0].grid
    nv = int(grid.num_voxels)
    coords = np.asarray(grid.coords)[:nv, 1:]  # drop batch col (single scene)
    in_feats = np.concatenate(
        [np.asarray(batch.feats)[:nv], np.asarray(batch.coords_float)[:nv]], axis=1
    ).astype(np.float32)

    backbone = SparseUNetBackbone(channels=C, num_blocks=NB, in_channels=IN_CH)
    full_in = jnp.concatenate([batch.feats, batch.coords_float], axis=1)
    mine = np.asarray(backbone.apply(bb_vars, full_in, batch.plan, False))[:nv]

    ref = _oracle_backbone(sd, coords, in_feats)
    np.testing.assert_allclose(mine, ref, rtol=1e-3, atol=1e-3)


def test_oracle_subm_matches_torch_dense_conv3d():
    """Break the oracle's self-consistency loop (ADVICE r2: a systematic
    conv-vs-correlation mirror in BOTH the hand-written oracle and the
    converter would pass the activation-parity test above).

    spconv's SubMConv3d is documented and tested upstream as the sparse
    drop-in for torch's dense Conv3d (cross-correlation semantics), so on a
    FULLY-DENSE grid the hand-written `_oracle_subm` must reproduce
    torch.nn.functional.conv3d exactly — library code nobody in this repo
    wrote. A flipped tap order in the oracle would mirror the kernel and
    fail this for any asymmetric kernel."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(7)
    D = H = W = 4
    cin, cout = 3, 5
    # fully-dense active set -> submanifold conv == ordinary dense conv
    coords = [(z, y, x) for z in range(D) for y in range(H) for x in range(W)]
    pos = {c: i for i, c in enumerate(coords)}
    x = rng.standard_normal((len(coords), cin)).astype(np.float32)
    # deliberately asymmetric kernel (out, kz, ky, kx, in)
    w = rng.standard_normal((cout, 3, 3, 3, cin)).astype(np.float32)

    ours = _oracle_subm(x, w, coords, pos)

    x_dense = torch.from_numpy(
        x.reshape(D, H, W, cin).transpose(3, 0, 1, 2)[None])  # [1, C, D, H, W]
    w_t = torch.from_numpy(w.transpose(0, 4, 1, 2, 3))  # [out, in, kD, kH, kW]
    ref = F.conv3d(x_dense, w_t, padding=1)[0].permute(1, 2, 3, 0)
    ref = ref.reshape(len(coords), cout).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_tap_candidates_well_formed():
    """8 mirror candidates (identity first, each an involution on taps);
    48 with transposes, all distinct valid permutations."""
    from convert_torch_ckpt import tap_candidates

    cands = list(tap_candidates())
    assert len(cands) == 8 and cands[0] == ("identity", None)
    seen = {(): True}
    for name, perm in cands[1:]:
        p = np.asarray(perm)
        assert sorted(perm) == list(range(27)), name
        np.testing.assert_array_equal(p[p], np.arange(27), err_msg=name)
        seen[tuple(perm)] = True
    assert len(seen) == 8  # identity + 7 distinct mirrors
    full = list(tap_candidates(include_transposes=True))
    assert len(full) == 48
    keys = {tuple(p) if p else () for _, p in full}
    assert len(keys) == 48
    # the runbook's "full spatial flip" candidate is present
    assert list(range(26, -1, -1)) in [p for _, p in cands if p]


@pytest.mark.slow
def test_tap_calibration_recovers_planted_mirror():
    """--calibrate-taps machinery: plant a z-mirror as the 'reference'
    enumeration, synthesize reference features with it, and check the
    calibration sweep selects exactly that candidate with corr ~1 while
    every other mirror scores visibly lower (PARITY.md escape hatch as
    one command, reference blocks.py:183-233)."""
    import convert_torch_ckpt as cc
    from convert_torch_ckpt import calibrate_tap_perm, tap_candidates

    rng = np.random.default_rng(3)
    sd = _fake_state_dict(rng)
    prepared = _prepared(seed=5)
    model = ISBNet(_tiny_cfg())

    def _fn(m, b):
        out, _ = m.trunk(b, False)
        return m.run_mask_tower(out["voxel_feats"], b.valid, False)

    apply = jax.jit(lambda v, b: model.apply(v, b, method=_fn))

    def run_feats(variables):
        return np.asarray(apply(variables, prepared.batch))

    planted = dict(tap_candidates())["flips(z,y,x)=(1, 0, 0)"]
    saved = cc.TAP_PERM
    cc.TAP_PERM = planted
    try:
        ref = run_feats(convert_state_dict(sd)[0])
    finally:
        cc.TAP_PERM = saved

    results = calibrate_tap_perm(sd, run_feats, ref)
    corr, name, perm = results[0]
    assert perm == planted, results
    assert corr > 0.999, results
    assert results[1][0] < 0.99, results
