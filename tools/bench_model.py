#!/usr/bin/env python
"""Model micro/macro benchmarks on the chip, reproducing docs/PERF.md.

  python tools/bench_model.py --what forward      # full ISBNet forward
  python tools/bench_model.py --what step         # full-size train step
  python tools/bench_model.py --what infer        # forward_inference (iterative)
  python tools/bench_model.py --what dyco         # dyco XLA vs Pallas kernel
  python tools/bench_model.py --what spf_step     # SPFormer train step

Methodology (docs/PERF.md "Timing methodology warning"): the axon relay
ELIDES unfetched results, so every timed iteration consumes its outputs
through float(jnp.sum(...)) — each fetch costs ~30 ms of tunnel latency,
included in the printed numbers. One warmup iteration absorbs compiles
(90-100 s remote AOT for the big programs); the metric is the BEST timed
pass. Defaults match the PERF.md scene: ~240k points -> 262144 voxel
capacity, C=32, 7 levels, Q=256, S=4096.
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from gapro_tpu.utils.platform import honor_env_platform  # noqa: E402

honor_env_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def timed(fn, iters, label):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{label}: best {best * 1e3:.1f} ms over {iters} "
          f"(all: {' '.join('%.1f' % (t * 1e3) for t in ts)})", flush=True)
    return best


def full_size_prep(n_cap, levels, spp_cap, shrink):
    from gapro_tpu.data import make_synthetic_scene, remap_semantic_for_training
    from gapro_tpu.models.prepare import (points_to_batch_np,
                                          prepare_voxel_batch,
                                          upload_point_batch)

    scale = min(1.0, n_cap / 262144)  # ~240k points at the full 262144 cap
    s = make_synthetic_scene(seed=0, n_objects=12,
                             points_per_object=int(15000 * scale),
                             n_floor=int(40000 * scale),
                             n_wall=int(20000 * scale))
    print(f"scene: {len(s.xyz)} points", flush=True)
    pb = points_to_batch_np([dict(
        xyz=s.xyz, rgb=s.rgb, spp=s.spp,
        semantic=remap_semantic_for_training(s.semantic_label),
        instance=s.instance_label)], voxel_scale=50, n_cap=n_cap)
    pbj = upload_point_batch(pb)
    prepared = prepare_voxel_batch(pbj, n_cap, 1, levels, spp_cap, shrink)
    return prepared


_SHRINK = (0.67, 0.3, 0.25, 0.25, 0.25, 0.25)  # the shipped per-level schedule


def shrink_for(levels):
    return _SHRINK[: levels - 1] if levels <= 7 else _SHRINK + (0.25,) * (levels - 7)


def build_isbnet(levels, spp_cap):
    from gapro_tpu.models import ISBNet, ISBNetConfig

    cfg = ISBNetConfig(channels=32, num_blocks=levels, n_sample_pa1=2048,
                       n_queries=256, neighbor=32, dec_dim=128,
                       mask_dim_out=32, spp_cap=spp_cap)
    return ISBNet(cfg)


def bench_forward(args, infer=False):
    prepared = full_size_prep(args.n_cap, args.levels, args.spp_cap, shrink_for(args.levels))
    model = build_isbnet(args.levels, args.spp_cap)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), prepared.batch, False)
    if infer:
        fn = jax.jit(lambda v, b: model.apply(
            v, b, method=lambda m, x: m.forward_inference(x, (192, 128, 64))))
    else:
        fn = jax.jit(lambda v, b: model.apply(v, b, False))

    def run():
        out = fn(variables, prepared.batch)
        return float(sum(jnp.sum(jnp.abs(v.astype(jnp.float32)))
                         for v in jax.tree_util.tree_leaves(out)))

    print("warmup (compile)...", flush=True)
    t0 = time.perf_counter()
    run()
    print(f"warmup {time.perf_counter() - t0:.1f}s", flush=True)
    timed(run, args.iters, "infer" if infer else "forward")


def bench_step(args, spformer=False):
    from gapro_tpu.train.state import create_train_state

    prepared = full_size_prep(args.n_cap, args.levels, args.spp_cap, shrink_for(args.levels))
    if spformer:
        from gapro_tpu.losses.spformer_criterion import SPFormerCriterionConfig
        from gapro_tpu.models.spformer import SPFormer, SPFormerConfig
        from gapro_tpu.train.step import make_spformer_train_step

        model = SPFormer(SPFormerConfig(media=32, blocks=min(args.levels, 5),
                                        num_layer=6, num_query=400,
                                        d_model=256, nhead=8, hidden_dim=1024,
                                        spp_cap=args.spp_cap))
        step = make_spformer_train_step(model, SPFormerCriterionConfig(inst_cap=192))
    else:
        from gapro_tpu.losses.criterion import CriterionConfig
        from gapro_tpu.train.step import make_train_step

        model = build_isbnet(args.levels, args.spp_cap)
        step = make_train_step(model, CriterionConfig(inst_cap=192))
    state = create_train_state(
        jax.jit(model.init, static_argnums=(2,))(
            jax.random.PRNGKey(0), prepared.batch, False), lr=1e-3)

    def run():
        nonlocal state
        state, losses = step(state, prepared, jnp.float32(1e-3))
        return float(losses["loss"])

    print("warmup (compile)...", flush=True)
    t0 = time.perf_counter()
    run()
    print(f"warmup {time.perf_counter() - t0:.1f}s", flush=True)
    timed(run, args.iters, "spformer step" if spformer else "train step")


def bench_dyco(args):
    from gapro_tpu.models.dyco import _dyco_pallas, dyco_mlp_xla

    B, Q, S, m, h = 1, 256, args.spp_cap, 32, 16
    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    a = (f(B, Q, m + 6, m), f(B, Q, m, h), f(B, Q, h, 1), f(B, Q, m),
         f(B, Q, h), f(B, Q, 3), jnp.abs(f(B, Q, 3)), f(B, S, m), f(B, S, 3),
         jnp.abs(f(B, S, 3)), jnp.asarray(rng.random((B, S)) > 0.1))
    xla = jax.jit(dyco_mlp_xla)
    ker = jax.jit(_dyco_pallas)
    rx = xla(*a)
    rk = ker(*a)
    print(f"max |xla - kernel| = {float(jnp.max(jnp.abs(rx - rk))):.2e}",
          flush=True)
    timed(lambda: float(jnp.sum(jnp.abs(xla(*a)))), args.iters, "dyco XLA")
    timed(lambda: float(jnp.sum(jnp.abs(ker(*a)))), args.iters, "dyco Pallas")
    # backward (training path): kernel fwd + rematerialized XLA bwd
    gx = jax.jit(jax.grad(lambda *p: jnp.sum(jnp.tanh(dyco_mlp_xla(*p, a[-1])
                                                      * 1e-2)), argnums=(0, 7)))
    gk = jax.jit(jax.grad(lambda *p: jnp.sum(jnp.tanh(_dyco_pallas(*p, a[-1])
                                                      * 1e-2)), argnums=(0, 7)))
    consume = lambda g: float(sum(jnp.sum(jnp.abs(t)) for t in g))
    consume(gx(*a[:-1])), consume(gk(*a[:-1]))
    timed(lambda: consume(gx(*a[:-1])), args.iters, "dyco XLA f+b")
    timed(lambda: consume(gk(*a[:-1])), args.iters, "dyco Pallas f+b")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="forward",
                    choices=["forward", "infer", "step", "spf_step", "dyco"])
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--n_cap", type=int, default=262144)
    ap.add_argument("--levels", type=int, default=7)
    ap.add_argument("--spp_cap", type=int, default=4096)
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)
    if args.what == "forward":
        bench_forward(args)
    elif args.what == "infer":
        bench_forward(args, infer=True)
    elif args.what == "step":
        bench_step(args)
    elif args.what == "spf_step":
        bench_step(args, spformer=True)
    elif args.what == "dyco":
        bench_dyco(args)


if __name__ == "__main__":
    main()
