import jax
import jax.numpy as jnp
import numpy as np

from gapro_tpu.data import make_synthetic_scene, remap_semantic_for_training
from gapro_tpu.models import ISBNet
from gapro_tpu.models.prepare import points_to_batch_np, prepare_voxel_batch

from tests.test_isbnet_forward import _tiny_cfg
import pytest


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
