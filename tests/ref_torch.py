"""Load the reference's torch model classes on CPU for numeric-parity tests.

The reference (``/root/reference/models``) cannot be imported as-is: it
requires CUDA extensions (knn_cuda, pointnet2_ops, pytorch3d, chamfer, emd),
has a circular ``Point_MAE_unify`` ↔ ``Point_MAE_pretask_dev`` import that
fails either way round, and references an undefined ``pooling`` symbol.

This helper execs each reference source file into its own namespace with the
import lines stripped and pure-torch CPU equivalents injected for every CUDA
dependency, then cross-wires the names the circular imports would have bound.
The CPU stubs reproduce the CUDA ops' exact semantics:

* ``pointnet2_utils.furthest_point_sample``: start at index 0, running
  min-distance table in f32, argmax selection — identical index sequence to
  ``upp_tpu.ops.fps`` (same algorithm, tested index-parity).
* ``knn_cuda.KNN(k, transpose_mode=True)``: k smallest squared distances,
  ascending.
* ``pytorch3d.ops.knn_points``: (dists, idx, nn) with K ascending neighbours.
* ``pooling``: BatchNorm over flattened tokens + max over the neighbour axis
  (the reference uses this undefined symbol at
  ``Point_MAE_pretask_dev.py:294``; BN+max is the reconstruction our
  ``scan_blocks`` implements — this stub keeps both sides identical).

NOTE: reads reference sources as data (exec), never imports them as modules,
so no bytecode is written into the read-only reference tree.
"""

from __future__ import annotations

import re
import types
from typing import Dict

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

REF_MODELS = "/root/reference/models"

# ---------------------------------------------------------------- CUDA stubs


def torch_fps_idx(xyz: torch.Tensor, npoint: int) -> torch.Tensor:
    """pointnet2_utils.furthest_point_sample semantics on CPU."""
    B, N, _ = xyz.shape
    xyz = xyz.float()
    dists = torch.full((B, N), 1e10, dtype=torch.float32)
    idx = torch.zeros(B, npoint, dtype=torch.long)
    cur = torch.zeros(B, dtype=torch.long)
    ar = torch.arange(B)
    for i in range(npoint):
        idx[:, i] = cur
        d = ((xyz - xyz[ar, cur][:, None, :]) ** 2).sum(-1)
        dists = torch.minimum(dists, d)
        cur = dists.argmax(1)
    return idx


def _misc_fps(data: torch.Tensor, number: int):
    """reference ``utils/misc.py:13-20`` fps(data, number)."""
    fps_idx = torch_fps_idx(data, number)
    fps_data = torch.gather(data, 1, fps_idx[..., None].expand(-1, -1, data.shape[-1]))
    return fps_data, fps_idx.int()


class _KNNStub(tnn.Module):
    """knn_cuda.KNN(k, transpose_mode=True): (dist, idx[B,G,k]) ascending."""

    def __init__(self, k, transpose_mode=True):
        super().__init__()
        assert transpose_mode, "reference only uses transpose_mode=True"
        self.k = k

    def forward(self, xyz, center):
        d = ((center[:, :, None, :] - xyz[:, None, :, :]) ** 2).sum(-1)
        dist, idx = torch.topk(d, self.k, dim=-1, largest=False, sorted=True)
        return torch.sqrt(dist), idx


def _knn_points(p1, p2, K=1, return_nn=False):
    """pytorch3d.ops.knn_points on CPU: (sq dists, idx, nn)."""
    d = ((p1[:, :, None, :] - p2[:, None, :, :]) ** 2).sum(-1)
    dists, idx = torch.topk(d, K, dim=-1, largest=False, sorted=True)
    nn = None
    if return_nn:
        B, N, _ = idx.shape
        nn = torch.gather(p2[:, None].expand(-1, N, -1, -1), 2,
                          idx[..., None].expand(-1, -1, -1, p2.shape[-1]))
    return dists, idx, nn


class _DropPath(tnn.Module):
    """timm DropPath (identity in eval / at drop_prob=0)."""

    def __init__(self, drop_prob=0.0):
        super().__init__()
        self.drop_prob = float(drop_prob or 0.0)

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep = 1.0 - self.drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = x.new_empty(shape).bernoulli_(keep)
        return x.div(keep) * mask


class _ChamferL1(tnn.Module):
    def cuda(self):  # noqa: A003 - reference calls .cuda() on CPU-only hosts
        return self

    def forward(self, x, y):
        d = ((x[:, :, None, :] - y[:, None, :, :]) ** 2).sum(-1)
        return (torch.sqrt(d.min(2).values).mean(1)
                + torch.sqrt(d.min(1).values).mean(1)).mean() / 2


class _ChamferL2(_ChamferL1):
    def forward(self, x, y):
        d = ((x[:, :, None, :] - y[:, None, :, :]) ** 2).sum(-1)
        return (d.min(2).values.mean(1) + d.min(1).values.mean(1)).mean()


def _pooling(x, transform=None):
    """BN over flattened tokens + max over the neighbour axis (see module
    docstring; matches scan_blocks' propagation pooling)."""
    B, S, K, C = x.shape
    flat = x.reshape(-1, C)
    if transform is not None:
        flat = transform(flat)
    return flat.reshape(B, S, K, C).max(dim=2).values


def _three_nn(unknown: torch.Tensor, known: torch.Tensor):
    """pointnet2_utils.three_nn: squared distances + indices of the 3 nearest
    known points per unknown point, ascending."""
    d = ((unknown[:, :, None, :] - known[:, None, :, :]) ** 2).sum(-1)
    dist, idx = torch.topk(d, 3, dim=-1, largest=False, sorted=True)
    return dist, idx.int()


def _three_interpolate(feats: torch.Tensor, idx: torch.Tensor,
                       weight: torch.Tensor):
    """pointnet2_utils.three_interpolate: feats [B,C,m], idx/weight [B,n,3]
    → [B,C,n]."""
    B, C, m = feats.shape
    n = idx.shape[1]
    idx = idx.long()
    gathered = torch.gather(
        feats[:, :, None, :].expand(-1, -1, n, -1), 3,
        idx[:, None, :, :].expand(-1, C, -1, -1))          # [B,C,n,3]
    return (gathered * weight[:, None, :, :]).sum(-1)


class _Registry:
    def register_module(self, *a, **k):
        def deco(cls):
            return cls
        return deco if not (a and isinstance(a[0], type)) else a[0]


# --------------------------------------------------------------- source exec

_IMPORT_STRIP = re.compile(
    r"^(import timm|from timm\b|import ipdb|import matplotlib|"
    r"from mpl_toolkits\b|from knn_cuda\b|from extensions\b|import emd|"
    r"import pytorch3d|from utils\b|from \.\w+ import|from \.build import|"
    r"import models\b|from pointnet2_ops\b)")


def _patched_source(path: str) -> str:
    lines = []
    for ln in open(path).read().splitlines():
        if _IMPORT_STRIP.match(ln.strip()):
            lines.append("# [stripped] " + ln)
        else:
            lines.append(ln)
    return "\n".join(lines)


def _base_globals() -> Dict:
    emd_mod = types.ModuleType("emd")
    emd_mod.__call__ = None
    pt3d = types.SimpleNamespace(ops=types.SimpleNamespace(knn_points=_knn_points))
    return {
        "torch": torch, "nn": tnn, "F": F, "np": np, "random": __import__("random"),
        "timm": types.ModuleType("timm"),
        "DropPath": _DropPath,
        "trunc_normal_": lambda t, mean=0.0, std=1.0, a=-2.0, b=2.0:
            tnn.init.trunc_normal_(t, mean=mean, std=std, a=a * std, b=b * std),
        "MODELS": _Registry(),
        "misc": types.SimpleNamespace(fps=_misc_fps),
        "print_log": lambda *a, **k: None,
        "get_missing_parameters_message": lambda x: str(x),
        "get_unexpected_parameters_message": lambda x: str(x),
        "KNN": _KNNStub,
        "ChamferDistanceL1": _ChamferL1,
        "ChamferDistanceL2": _ChamferL2,
        "emd": emd_mod,
        "pytorch3d": pt3d,
        "plt": types.SimpleNamespace(),
        "Axes3D": object,
        "ipdb": types.SimpleNamespace(set_trace=lambda: None),
        "pooling": _pooling,
        "pointnet2_utils": types.SimpleNamespace(
            furthest_point_sample=lambda d, n: torch_fps_idx(d, n).int(),
            gather_operation=None,
            three_nn=_three_nn, three_interpolate=_three_interpolate),
    }


_CACHE: Dict[str, Dict] = {}


def load_reference_models() -> Dict[str, Dict]:
    """Exec the patched reference sources; returns {'modules','dev','unify'}
    namespaces with the torch classes."""
    if _CACHE:
        return _CACHE
    ns_modules = _base_globals()
    exec(compile(_patched_source(f"{REF_MODELS}/modules.py"),
                 "ref/modules.py", "exec"), ns_modules)

    shared = {"square_distance": ns_modules["square_distance"],
              "index_points": ns_modules["index_points"]}

    ns_dev = {**_base_globals(), **shared}
    exec(compile(_patched_source(f"{REF_MODELS}/Point_MAE_pretask_dev.py"),
                 "ref/Point_MAE_pretask_dev.py", "exec"), ns_dev)

    ns_unify = {**_base_globals(), **shared,
                # names Point_MAE_unify.py imports from Point_MAE_pretask_dev
                "Block": ns_dev["Block"],
                "RectifyPrompter": ns_dev["RectifyPrompter"],
                "TransformerDecoder": ns_dev["TransformerDecoder"]}
    exec(compile(_patched_source(f"{REF_MODELS}/Point_MAE_unify.py"),
                 "ref/Point_MAE_unify.py", "exec"), ns_unify)

    # names Point_MAE_pretask_dev.py imports from Point_MAE_unify
    ns_dev["Group"] = ns_unify["Group"]
    ns_dev["propagate"] = ns_unify["propagate"]

    _CACHE.update({"modules": ns_modules, "dev": ns_dev, "unify": ns_unify})
    return _CACHE


_TU_CACHE: Dict[str, Dict] = {}


def load_reference_transformer_utils() -> Dict:
    """Exec the patched ``models/Transformer_utils.py`` (the AdaPoinTr block
    zoo incl. the deformable attention variants) with CPU stubs for
    pointnet2's three_nn/three_interpolate."""
    if _TU_CACHE:
        return _TU_CACHE
    ns = _base_globals()
    ns["einops"] = __import__("einops")
    exec(compile(_patched_source(f"{REF_MODELS}/Transformer_utils.py"),
                 "ref/Transformer_utils.py", "exec"), ns)
    _TU_CACHE.update(ns)
    return _TU_CACHE


# ------------------------------------------------------------- config object

class _AttrDict(dict):
    """dict + attribute access (EasyDict-alike): the seg model both expands
    ``**config.prompter_config`` and reads
    ``config.prompter_config.downstream_adapter``
    (``Point_MAE_unify_segment.py:357,585``)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


class RefCfg:
    """Attribute/nested-dict hybrid matching the reference's EasyDict usage
    (``config.transformer_config.trans_dim``; ``config.prompter_config`` must
    stay dict-like for ``**`` expansion and ``[...]`` indexing, but also
    support attribute reads)."""

    def __init__(self, d: Dict):
        self._d = d

    def __getattr__(self, k):
        try:
            v = self._d[k]
        except KeyError as e:
            raise AttributeError(k) from e
        if isinstance(v, dict):
            return _AttrDict(v) if k == "prompter_config" else RefCfg(v)
        return v

    def get(self, k, default=None):
        v = self._d.get(k, default)
        if isinstance(v, dict):
            return _AttrDict(v) if k == "prompter_config" else RefCfg(v)
        return v


def randomize_bn_stats(model: tnn.Module, seed: int = 0) -> None:
    """Give every BatchNorm non-trivial running stats so the ckpt-shim's
    stat mapping is exercised."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
                m.running_mean.uniform_(-0.2, 0.2, generator=g)
                m.running_var.uniform_(0.8, 1.25, generator=g)


_SEG_CACHE: Dict[str, Dict] = {}


def load_reference_seg() -> Dict:
    """Exec the patched ``models/Point_MAE_unify_segment.py`` (the UPP part
    segmentation model) with the shared CUDA stubs; cross-wires
    Group/propagate (from Point_MAE_unify) and Block/RectifyPrompter/
    TransformerDecoder (from Point_MAE_pretask_dev) exactly as its imports
    would have bound them."""
    if _SEG_CACHE:
        return _SEG_CACHE
    base = load_reference_models()
    ns = _base_globals()
    ns.update({
        "square_distance": base["modules"]["square_distance"],
        "index_points": base["modules"]["index_points"],
        "Group": base["unify"]["Group"],
        "propagate": base["unify"]["propagate"],
        "Block": base["dev"]["Block"],
        "RectifyPrompter": base["dev"]["RectifyPrompter"],
        "TransformerDecoder": base["dev"]["TransformerDecoder"],
    })
    exec(compile(_patched_source(f"{REF_MODELS}/Point_MAE_unify_segment.py"),
                 "ref/Point_MAE_unify_segment.py", "exec"), ns)
    _SEG_CACHE.update(ns)
    return _SEG_CACHE


_MAE_CACHE: Dict[str, Dict] = {}


def load_reference_mae() -> Dict:
    """Exec the patched ``models/Point_MAE_cp.py`` (vanilla Point-MAE
    pretraining + PointTransformer baselines) with the shared CUDA stubs;
    cross-wires Adapter (from Point_MAE_unify) and square_distance/
    index_points (from modules) as its imports would have bound them."""
    if _MAE_CACHE:
        return _MAE_CACHE
    base = load_reference_models()
    ns = _base_globals()
    ns.update({
        "square_distance": base["modules"]["square_distance"],
        "index_points": base["modules"]["index_points"],
        "Adapter": base["unify"]["Adapter"],
    })
    exec(compile(_patched_source(f"{REF_MODELS}/Point_MAE_cp.py"),
                 "ref/Point_MAE_cp.py", "exec"), ns)
    _MAE_CACHE.update(ns)
    return _MAE_CACHE
