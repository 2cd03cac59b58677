#!/usr/bin/env python
"""Measure a REFERENCE-equivalent serial GP labeling loop in plain torch.

The reference sweep (gapro/gen_ps.py:36-132) fits one gpytorch variational
GP classifier per overlapping box pair, serially, 50 Adam iterations each
(gaussian_process_utils.py:382-445). gpytorch + CUDA are absent on this
machine, so this script reimplements the same math from scratch in torch —
whitened SVGP with ALL train points as learnable inducing locations
(CholeskyVariationalDistribution(n) + VariationalStrategy), ConstantMean,
Scale*RBF kernel, probit Bernoulli likelihood with Gauss-Hermite ELBO,
Adam(lr=0.1) x 50 — and runs the reference's serial per-pair loop over the
same synthetic scenes bench.py uses.

Output: measured serial scenes/sec on this host's CPU. bench.py's baseline
constant (0.5 scenes/s for the reference's GPU) is justified against this
anchor: these are hundreds of tiny (n <= ~500) fits where GPU speedups over
CPU torch are modest (launch-latency-bound), so CPU-torch serial throughput
approximates the reference's GPU throughput within a small factor.
"""

import math
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import torch


def fit_gp_torch(train_x, train_y, test_x, iters=50, lr=0.1, n_gh=20):
    """Whitened SVGP binary classifier, inducing = train points (the
    reference's configuration). Returns (probs, mu, var) on test_x.

    Matches gpytorch semantics exactly (gaussian_process_utils.py:11-25 +
    VariationalELBO): SCALAR lengthscale (RBFKernel default, no ARD),
    ELBO = mean expected-log-lik - KL/num_data (VariationalELBO divides
    both terms by num_data), log_ndtr for the probit log-likelihood, and
    softplus raw->positive transforms with gpytorch's zero init.  This is
    the independent oracle tests/test_parity_gp.py checks
    gapro_tpu/gp/variational.py against.
    """
    n, d = train_x.shape
    z = train_x.clone().requires_grad_(True)  # learn_inducing_locations=True
    m = torch.zeros(n, requires_grad=True)
    L_raw = torch.eye(n).clone().requires_grad_(True)
    raw_ls = torch.zeros(1, requires_grad=True)  # RBFKernel: scalar, no ARD
    raw_os = torch.zeros(1, requires_grad=True)
    mean_c = torch.zeros(1, requires_grad=True)

    gh_x, gh_w = np.polynomial.hermite.hermgauss(n_gh)
    gh_x = torch.from_numpy(gh_x).float()
    gh_w = torch.from_numpy(gh_w).float() / math.sqrt(math.pi)
    std_norm = torch.distributions.Normal(0.0, 1.0)

    def kernel(a, b):
        ls = torch.nn.functional.softplus(raw_ls)
        osc = torch.nn.functional.softplus(raw_os)
        d2 = ((a[:, None, :] - b[None, :, :]) / ls).pow(2).sum(-1)
        return osc * torch.exp(-0.5 * d2)

    def q_f(x):
        L = torch.tril(L_raw)
        kzz = kernel(z, z) + 1e-4 * torch.eye(n)
        lz = torch.linalg.cholesky(kzz)
        kzx = kernel(z, x)
        interp = torch.linalg.solve_triangular(lz, kzx, upper=False)  # [n, m]
        mean = interp.T @ m + mean_c
        kxx_diag = kernel(x, x).diagonal()
        s_half = L.T @ interp  # [n, m]
        var = kxx_diag - interp.pow(2).sum(0) + s_half.pow(2).sum(0)
        return mean, var.clamp_min(1e-10), L

    opt = torch.optim.Adam([z, m, L_raw, raw_ls, raw_os, mean_c], lr=lr)
    for _ in range(iters):
        mean, var, L = q_f(train_x)
        f = mean[None, :] + math.sqrt(2.0) * gh_x[:, None] * var.sqrt()[None, :]
        logp = torch.special.log_ndtr(train_y[None, :] * f)  # y in {-1,+1}
        exp_ll = (gh_w[:, None] * logp).sum(0).mean()
        diag = L.diagonal().abs().clamp_min(1e-20)
        kl = 0.5 * (L.pow(2).sum() + m.pow(2).sum() - n
                    - 2.0 * torch.log(diag).sum())
        loss = -(exp_ll - kl / n)
        opt.zero_grad()
        loss.backward()
        opt.step()

    with torch.no_grad():
        mean, var, _ = q_f(test_x)
        probs = std_norm.cdf(mean / (1 + var).sqrt())
    return probs.numpy(), mean.numpy(), var.numpy()


def main():
    from gapro_tpu.data import make_synthetic_scene
    from gapro_tpu.labeler import LabelerConfig, instance_info
    from gapro_tpu.labeler.pipeline import enumerate_scene, submit_scene

    n_scenes = 3
    torch.set_num_threads(torch.get_num_threads())
    cfg = LabelerConfig()
    times = []
    n_fits = 0
    for s in range(n_scenes):
        scene = make_synthetic_scene(seed=s, n_objects=12, points_per_object=4000,
                                     n_floor=30000, n_wall=16000)
        _, inst_cls, inst_box, inst_vol, _ = instance_info(
            scene.xyz, scene.instance_label, scene.semantic_label)
        gp_feats = np.concatenate([scene.xyz, scene.rgb], 1)
        h = submit_scene(scene.xyz, gp_feats, scene.spp, inst_cls, inst_box,
                         inst_vol, cfg=cfg)
        res = enumerate_scene(h, cfg)
        t0 = time.perf_counter()
        for job in res.jobs:
            tx = np.concatenate([res.feats_spp[job.b1_inds],
                                 res.feats_spp[job.b2_inds]])
            ty = np.concatenate([-np.ones(len(job.b1_inds)),
                                 np.ones(len(job.b2_inds))])
            qx = res.feats_spp[job.intersect_inds]
            fit_gp_torch(torch.from_numpy(tx).float(),
                         torch.from_numpy(ty).float(),
                         torch.from_numpy(qx).float())
            n_fits += 1
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"scene {s}: {len(res.jobs)} GP fits, {dt:.2f}s serial torch",
              flush=True)
    total = sum(times)
    print(f"serial torch-CPU GP loop: {n_scenes / total:.3f} scenes/s "
          f"({n_fits} fits, {total / max(n_fits, 1) * 1000:.0f} ms/fit)")


if __name__ == "__main__":
    main()
