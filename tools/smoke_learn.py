#!/usr/bin/env python
"""End-to-end learning smoke test on the real TPU: overfit a small ISBNet
on two synthetic scenes and verify AP rises above zero.

Latest run on TPU v5e: 300 steps in 57 s (device-auction Hungarian),
loss 371 -> 108, AP50 0.50 on the training scenes. Proves the complete
train -> iterative-sampling inference -> ScanNet-AP loop on chip.

Usage: python tools/smoke_learn.py
"""

import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from gapro_tpu.data import make_synthetic_scene, remap_semantic_for_training
from gapro_tpu.models import ISBNet, ISBNetConfig, TestConfig, get_instances
from gapro_tpu.models.prepare import points_to_batch_np, prepare_voxel_batch
from gapro_tpu.losses.criterion import CriterionConfig
from gapro_tpu.train.state import create_train_state
from gapro_tpu.train.step import make_train_step
from gapro_tpu.eval import ScanNetEval

cfg = ISBNetConfig(channels=16, num_blocks=4, n_sample_pa1=256, n_queries=64,
                   neighbor=16, dec_dim=64, mask_dim_out=16, spp_cap=1024,
                   filter_bg_thresh=0.0)
crit = CriterionConfig(inst_cap=32)
scenes = [make_synthetic_scene(seed=i, n_objects=5, points_per_object=800,
                               n_floor=1500, n_wall=1000) for i in range(2)]
preps = []
for s in scenes:
    pb = points_to_batch_np([dict(xyz=s.xyz, rgb=s.rgb, spp=s.spp,
        semantic=remap_semantic_for_training(s.semantic_label),
        instance=s.instance_label)], voxel_scale=30, n_cap=8192)
    pbj = jax.tree_util.tree_map(jnp.asarray, pb)
    preps.append((pb, prepare_voxel_batch(pbj, 8192, 1, 4, 1024, 0.6)))

model = ISBNet(cfg)
variables = model.init(jax.random.PRNGKey(0), preps[0][1].batch, False)
state = create_train_state(variables, lr=2e-3)
step = make_train_step(model, crit)
t0 = time.time()
for it in range(300):
    _, prepared = preps[it % 2]
    state, losses = step(state, prepared, jnp.float32(2e-3))
    if it % 50 == 0:
        print(f"step {it}: loss {float(losses['loss']):.3f} "
              f"dice {float(losses['dice_loss']):.3f} cls {float(losses['cls_loss']):.3f}",
              flush=True)
print(f"300 steps in {time.time()-t0:.0f}s", flush=True)

variables = {"params": state.params, "batch_stats": state.batch_stats}
infer = jax.jit(lambda v, b: model.apply(v, b, method=lambda m, x: m.forward_inference(x, (48, 32, 16))))
all_preds, all_sems, all_insts = [], [], []
tc = TestConfig(topk=32, topk_insts=64, npoint_thresh=50, score_thresh=0.0)
for s, (pb, prepared) in zip(scenes, preps):
    out = infer(variables, prepared.batch)
    insts = get_instances("s", out, prepared.batch, np.asarray(pb.spp),
                          np.asarray(prepared.point2voxel), len(s.xyz), tc)
    all_preds.append(insts)
    all_sems.append(remap_semantic_for_training(s.semantic_label))
    all_insts.append(s.instance_label)
    print("instances:", len(insts), [round(i['conf'],2) for i in insts[:6]], flush=True)
res = ScanNetEval().evaluate(all_preds, all_sems, all_insts)
print(f"AP {res['all_ap']:.3f} AP50 {res['all_ap_50%']:.3f} AP25 {res['all_ap_25%']:.3f}", flush=True)
assert res['all_ap_25%'] > 0.1, 'model failed to learn'
print('smoke_learn OK')
