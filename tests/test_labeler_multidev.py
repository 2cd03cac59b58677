"""Multi-device GP pseudo-label sweep (SURVEY §2.5 showcase): the windowed
stream must give IDENTICAL labels whether it runs on 1 device or spread
over the whole 8-device CPU mesh (scenes and GP fit groups round-robin)."""

import jax
import numpy as np

from gapro_tpu.data.synthetic import make_synthetic_scene
from gapro_tpu.labeler import LabelerConfig, instance_info
from gapro_tpu.labeler.pipeline import generate_scene_labels_stream
import pytest


def _scene_dicts(n):
    out = []
    for seed in range(n):
        sc = make_synthetic_scene(seed=seed, n_objects=4, points_per_object=300,
                                  n_floor=800, n_wall=500, room=5.0)
        info = instance_info(sc.xyz, sc.instance_label, sc.semantic_label)
        _, cls, boxes, vols, _ = info
        out.append(dict(coords=sc.xyz, gp_feats=np.concatenate([sc.xyz, sc.rgb], 1),
                        spp=sc.spp, instance_cls=cls, instance_box=boxes,
                        instance_box_volume=vols))
    return out


@pytest.mark.slow
def test_stream_multidevice_matches_single():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide the 8-device CPU mesh"
    scenes = _scene_dicts(5)
    cfg = LabelerConfig(training_iter=20)

    single = [lab for _, lab in generate_scene_labels_stream(
        iter(scenes), cfg, window=2, devices=[devs[0]])]
    multi = [lab for _, lab in generate_scene_labels_stream(
        iter(scenes), cfg, window=2, devices=devs)]

    assert len(single) == len(multi) == 5
    for s, m in zip(single, multi):
        # (sem, inst, prob, mu, var, spp_inv): labels exact, floats to tol
        np.testing.assert_array_equal(np.asarray(s[0]), np.asarray(m[0]))
        np.testing.assert_array_equal(np.asarray(s[1]), np.asarray(m[1]))
        np.testing.assert_array_equal(np.asarray(s[5]), np.asarray(m[5]))
        for a, b in zip(s[2:5], m[2:5]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)
