"""Loaders for the reference implementation at /root/reference (parity oracles).

The reference is runnable torch/numpy for everything we compare against
(eval harness, matcher costs, criterion terms, labeler bookkeeping); its
unavailable deps (torch_scatter, gpytorch, spconv, gorilla, tensorboardX,
plyfile, tqdm) are stubbed here with minimal shims written from scratch.

Nothing in this file is copied from the reference — the torch_scatter shim
implements the documented scatter semantics with torch.scatter_reduce.
"""

from __future__ import annotations

import importlib
import importlib.util
import sys
import types

REF = "/root/reference"


# --------------------------------------------------------------------------- #
# torch_scatter shim
# --------------------------------------------------------------------------- #


def _make_torch_scatter():
    import torch

    def _norm(src, index, dim):
        if dim < 0:
            dim = src.dim() + dim
        if index.dim() < src.dim():
            # broadcast a 1-D segment-id vector along the remaining dims
            shape = [1] * src.dim()
            shape[dim] = -1
            index = index.view(shape).expand_as(src)
        return src, index, dim

    def _dim_size(index, dim_size):
        if dim_size is not None:
            return dim_size
        return int(index.max().item()) + 1 if index.numel() else 0

    def scatter(src, index, dim=-1, out=None, dim_size=None, reduce="sum"):
        src, index, dim = _norm(src, index, dim)
        n = _dim_size(index, dim_size)
        shape = list(src.shape)
        shape[dim] = n
        red = {"sum": "sum", "add": "sum", "mean": "mean", "min": "amin", "max": "amax"}[reduce]
        o = torch.zeros(shape, dtype=src.dtype, device=src.device)
        o.scatter_reduce_(dim, index, src, red, include_self=False)
        if out is not None:
            out.copy_(o)
            return out
        return o

    def scatter_add(src, index, dim=-1, out=None, dim_size=None):
        return scatter(src, index, dim, out, dim_size, reduce="sum")

    def scatter_mean(src, index, dim=-1, out=None, dim_size=None):
        return scatter(src, index, dim, out, dim_size, reduce="mean")

    def _scatter_arg(src, index, dim, dim_size, kind):
        src, index, dim = _norm(src, index, dim)
        n = _dim_size(index, dim_size)
        shape = list(src.shape)
        shape[dim] = n
        red = "amin" if kind == "min" else "amax"
        vals = torch.zeros(shape, dtype=src.dtype, device=src.device)
        vals.scatter_reduce_(dim, index, src, red, include_self=False)
        # arg: first position along dim where src equals the segment extremum
        sentinel = src.shape[dim]
        arg = torch.full(shape, sentinel, dtype=torch.long, device=src.device)
        hit = src == vals.gather(dim, index)
        pos_shape = [1] * src.dim()
        pos_shape[dim] = -1
        pos = torch.arange(src.shape[dim], device=src.device).view(pos_shape).expand_as(src)
        pos = torch.where(hit, pos, torch.full_like(pos, sentinel))
        arg.scatter_reduce_(dim, index, pos, "amin", include_self=True)
        return vals, arg

    def scatter_min(src, index, dim=-1, out=None, dim_size=None):
        return _scatter_arg(src, index, dim, dim_size, "min")

    def scatter_max(src, index, dim=-1, out=None, dim_size=None):
        return _scatter_arg(src, index, dim, dim_size, "max")

    m = types.ModuleType("torch_scatter")
    m.scatter = scatter
    m.scatter_add = scatter_add
    m.scatter_mean = scatter_mean
    m.scatter_min = scatter_min
    m.scatter_max = scatter_max
    return m


# --------------------------------------------------------------------------- #
# misc dependency stubs
# --------------------------------------------------------------------------- #


def _stub(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


class _NopWriter:
    def __init__(self, *a, **k):
        pass

    def __getattr__(self, _):
        return lambda *a, **k: None


class _Registry:
    def register_module(self, *a, **k):
        def deco(cls):
            return cls

        return deco


def install_stubs():
    """Idempotently install shim modules needed to import the reference."""
    import numpy as np

    # the reference predates numpy 2.x alias removal
    for alias, val in (("float", float), ("int", int), ("bool", bool)):
        if not hasattr(np, alias):
            setattr(np, alias, val)
    if not hasattr(np, "in1d"):
        np.in1d = np.isin
    if "torch_scatter" not in sys.modules:
        sys.modules["torch_scatter"] = _make_torch_scatter()
    if "tensorboardX" not in sys.modules:
        sys.modules["tensorboardX"] = _stub("tensorboardX", SummaryWriter=_NopWriter)
    if "spconv" not in sys.modules:
        class _SparseConvTensor:  # only used in isinstance checks (util/fp16.py)
            pass

        pytorch = _stub("spconv.pytorch", SparseConvTensor=_SparseConvTensor)
        spc = _stub("spconv", pytorch=pytorch)
        sys.modules["spconv"] = spc
        sys.modules["spconv.pytorch"] = pytorch
    if "plyfile" not in sys.modules:
        sys.modules["plyfile"] = _stub("plyfile", PlyData=object, PlyElement=object)
    if "gorilla" not in sys.modules:
        sys.modules["gorilla"] = _stub("gorilla", LOSSES=_Registry(), MODELS=_Registry())
    if "tqdm" not in sys.modules:
        try:
            import tqdm  # noqa: F401
        except ImportError:
            sys.modules["tqdm"] = _stub("tqdm", tqdm=lambda x, **k: x)
    if "open3d" not in sys.modules:
        sys.modules["open3d"] = _stub("open3d")


# --------------------------------------------------------------------------- #
# package loaders
# --------------------------------------------------------------------------- #


def _ensure_pkg(name, path):
    """Register a package module WITHOUT executing its __init__.py, so
    submodule imports resolve via __path__ while heavyweight package inits
    (which import the full CUDA-backed model zoo) never run."""
    if name in sys.modules:
        return sys.modules[name]
    pkg = types.ModuleType(name)
    pkg.__path__ = [path]
    pkg.__package__ = name
    sys.modules[name] = pkg
    return pkg


def _unavailable(*a, **k):
    raise NotImplementedError("reference CUDA op not available on this host")


def _any_attr_stub(name):
    """Module whose every attribute is the _unavailable callable (covers the
    long tail of compiled-op names imported at module scope)."""
    m = types.ModuleType(name)
    # a REAL __file__ string first: stdlib inspect.getmodule walks every
    # sys.modules entry and calls getabsfile on anything with __file__ —
    # the catch-all __getattr__ answering __file__ with a function crashes
    # any later inspect user (e.g. torch.library custom-op registration)
    m.__file__ = f"<ref_shim:{name}>"
    m.__getattr__ = lambda attr: _unavailable
    return m


def load_isbnet(module: str):
    """Import ``isbnet.<module>`` from the reference tree with stubs installed.

    e.g. load_isbnet("evaluation.instance_eval"), load_isbnet("model.matcher").
    """
    install_stubs()
    _ensure_pkg("isbnet", f"{REF}/ISBNet/isbnet")
    _ensure_pkg("isbnet.model", f"{REF}/ISBNet/isbnet/model")
    _ensure_pkg("isbnet.evaluation", f"{REF}/ISBNet/isbnet/evaluation")
    if "isbnet.ops" not in sys.modules:
        sys.modules["isbnet.ops"] = _any_attr_stub("isbnet.ops")
    if "isbnet.pointnet2" not in sys.modules:
        sys.modules["isbnet.pointnet2"] = _any_attr_stub("isbnet.pointnet2")
    return importlib.import_module(f"isbnet.{module}")


def load_spformer(module: str):
    install_stubs()
    _ensure_pkg("spformer", f"{REF}/SPFormer/spformer")
    _ensure_pkg("spformer.model", f"{REF}/SPFormer/spformer/model")
    _ensure_pkg("spformer.utils", f"{REF}/SPFormer/spformer/utils")
    _ensure_pkg("spformer.evaluation", f"{REF}/SPFormer/spformer/evaluation")
    # evaluation.instance_eval does `from spformer.utils import rle_decode`;
    # the bare package shim never runs __init__, so surface the real
    # mask_encoder's functions on it (mask_encoder is numpy+torch only)
    utils_pkg = sys.modules["spformer.utils"]
    if not hasattr(utils_pkg, "rle_decode"):
        enc = importlib.import_module("spformer.utils.mask_encoder")
        utils_pkg.rle_decode = enc.rle_decode
        utils_pkg.rle_encode = enc.rle_encode
    if "spformer.lib" not in sys.modules:
        lib = types.ModuleType("spformer.lib")
        lib.__path__ = []
        sys.modules["spformer.lib"] = lib
        sys.modules["spformer.lib.pointgroup_ops"] = _any_attr_stub(
            "spformer.lib.pointgroup_ops"
        )
    return importlib.import_module(f"spformer.{module}")


def load_gapro(name: str, fake_fit_gp_spp=None):
    """Load a flat gapro script (gen_ps_utils, scannet_planes, eval_ps_labels)
    as a standalone module. gen_ps_utils's ``from gaussian_process_utils
    import fit_gp_spp`` resolves to the provided fake (gpytorch is absent)."""
    install_stubs()
    if fake_fit_gp_spp is not None or "gaussian_process_utils" not in sys.modules:
        sys.modules["gaussian_process_utils"] = _stub(
            "gaussian_process_utils",
            fit_gp_spp=fake_fit_gp_spp or (lambda *a, **k: None),
        )
    modname = f"_ref_gapro_{name}"
    if modname in sys.modules and fake_fit_gp_spp is None:
        return sys.modules[modname]
    sys.modules.pop(modname, None)
    spec = importlib.util.spec_from_file_location(modname, f"{REF}/gapro/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod
