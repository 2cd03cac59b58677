"""Microbench for the windowed subm conv kernel (sparse/window_conv.py).

Builds the full-size synthetic-scene UNet plan, picks one level's window
geometry, and times `subm_conv_window` forward and forward+backward on
the attached device.  Used for kernel A/Bs (tile size, DMA depth, the
GAPRO_WINDOW_FUSED_MASKS issue-hoisting formulation):

    python tools/bench_window.py --c 32 --fused 0 --dump /tmp/wref.npz
    python tools/bench_window.py --c 32 --fused 1 --check /tmp/wref.npz

--dump/--check assert the two formulations agree bitwise (fwd) and to
fp32 tolerance (grads), so a timing win is only claimed on identical
outputs.  Replaces ad-hoc A/B scripts from rounds 2-4 (docs/PERF.md
"window kernel" sections).
"""

import argparse
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_cap", type=int, default=262144)
    ap.add_argument("--level", type=int, default=0,
                    help="UNet level whose geometry to bench (0 = finest)")
    ap.add_argument("--c", type=int, default=32, help="Cin = Cout")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--fused", default=None,
                    help="set GAPRO_WINDOW_FUSED_MASKS before import")
    ap.add_argument("--tile", type=int, default=None,
                    help="override GAPRO_WINDOW_T_SCHED with one tile size")
    ap.add_argument("--dump", default=None, help="save outputs to .npz")
    ap.add_argument("--check", default=None, help="compare outputs vs .npz")
    args = ap.parse_args()

    if args.fused is not None:
        os.environ["GAPRO_WINDOW_FUSED_MASKS"] = str(args.fused)
    if args.tile is not None:
        os.environ["GAPRO_WINDOW_T_SCHED"] = str(args.tile)

    from gapro_tpu.utils.platform import honor_env_platform

    honor_env_platform()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench_model import full_size_prep, shrink_for
    from gapro_tpu.sparse.window_conv import subm_conv_window

    prepared = full_size_prep(args.n_cap, 7, 4096, shrink_for(7))
    lvl = prepared.batch.plan.levels[args.level]
    tabs, valid = lvl.wtab, lvl.grid.valid
    assert tabs is not None, "window kernel disabled at this level"
    cap = valid.shape[0]
    print(f"level {args.level}: cap {cap}, tile {tabs.tile}, "
          f"window {tabs.window}, fused_masks="
          f"{os.environ.get('GAPRO_WINDOW_FUSED_MASKS', '0')}", flush=True)

    rng = np.random.default_rng(0)
    c = args.c
    feats = jnp.where(valid[:, None],
                      jnp.asarray(rng.normal(size=(cap, c)), jnp.float32), 0.0)
    w = jnp.asarray(rng.normal(size=(27, c, c)) * 0.1, jnp.float32)
    cot = jnp.asarray(rng.normal(size=(cap, c)), jnp.float32)

    fwd = jax.jit(lambda f, ww: subm_conv_window(f, tabs, ww, valid))

    def loss(f, ww):
        return jnp.vdot(subm_conv_window(f, tabs, ww, valid), cot)

    fb = jax.jit(jax.grad(loss, (0, 1)))

    out = jax.block_until_ready(fwd(feats, w))
    gf, gw = jax.block_until_ready(fb(feats, w))

    def timed(fn, label, chain=4):
        # `chain` async dispatches per measurement amortize the remote
        # relay's ~30 ms per-call latency out of the kernel time
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            rs = [fn(feats, w) for _ in range(chain)]
            jax.block_until_ready(rs)
            ts.append((time.perf_counter() - t0) / chain)
        print(f"{label}: best {min(ts) * 1e3:.2f} ms  "
              f"(all: {' '.join('%.1f' % (t * 1e3) for t in ts)})", flush=True)
        return min(ts)

    t_fwd = timed(fwd, f"fwd C={c}")
    t_fb = timed(fb, f"f+b C={c}")

    if args.dump:
        np.savez(args.dump, out=np.asarray(out), gf=np.asarray(gf),
                 gw=np.asarray(gw))
        print(f"dumped to {args.dump}")
    if args.check:
        ref = np.load(args.check)
        m = np.asarray(valid)
        exact = np.array_equal(np.asarray(out)[m], ref["out"][m])
        print(f"fwd bitwise identical: {exact}")
        np.testing.assert_allclose(np.asarray(out)[m], ref["out"][m],
                                   rtol=2e-5, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gf)[m], ref["gf"][m],
                                   rtol=2e-5, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gw), ref["gw"],
                                   rtol=2e-5, atol=3e-3)
        print("outputs/grads match reference dump")
    print(f"RESULT fwd_ms={t_fwd * 1e3:.2f} fb_ms={t_fb * 1e3:.2f}")


if __name__ == "__main__":
    main()
