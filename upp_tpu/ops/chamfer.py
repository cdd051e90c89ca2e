"""Chamfer distance — TPU-native, memory-bounded, differentiable.

Replaces the reference CUDA extension ``extensions/chamfer_dist``
(``chamfer.cu:15-229`` fwd/bwd; Python wrappers ``__init__.py:28-85``).

Design: nearest neighbours are found by a *chunked* scan over the pairwise
distance matrix (so [B,N,M] is never fully materialised for large N*M), with
the argmin indices treated as constants; the distances are then *recomputed*
differentiably from the gathered pairs. The gradient therefore flows only
through the matched pairs — numerically identical to the reference's custom
backward (``chamfer.cu:173-229``), while letting plain ``jax.grad`` do the
scatter. The chunked matmul rides the MXU.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .geometry import square_distance

_CHUNK = 1024  # query-axis chunk: B*CHUNK*M f32 stays far below VMEM/HBM limits


def _nn_idx(x: jnp.ndarray, y: jnp.ndarray,
            y_valid: Optional[jnp.ndarray]) -> jnp.ndarray:
    """argmin_m ||x_n - y_m||^2 per batch, chunked over n. Non-differentiable."""
    B, N, _ = x.shape
    chunk = min(_CHUNK, N)
    pad = (-N) % chunk
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    xs = xp.reshape(B, -1, chunk, 3).transpose(1, 0, 2, 3)  # [nchunk, B, chunk, 3]

    def one_chunk(xc):
        d = square_distance(xc, y)                          # [B, chunk, M]
        if y_valid is not None:
            d = jnp.where(y_valid[:, None, :], d, jnp.inf)
        return jnp.argmin(d, axis=-1).astype(jnp.int32)

    idx = jax.lax.map(one_chunk, xs)                         # [nchunk, B, chunk]
    idx = idx.transpose(1, 0, 2).reshape(B, -1)[:, :N]
    return idx


def nn_distance(xyz1: jnp.ndarray, xyz2: jnp.ndarray,
                valid1: Optional[jnp.ndarray] = None,
                valid2: Optional[jnp.ndarray] = None
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Bidirectional nearest-neighbour squared distances (chamfer.cu fwd).

    Returns (dist1 [B,N], idx1 [B,N], dist2 [B,M], idx2 [B,M]) where
    dist1[n] = min_m ||xyz1_n - xyz2_m||^2 etc. ``valid*`` masks exclude padded
    slots both as queries (their dist contributes 0) and as targets.
    Differentiable in xyz1/xyz2 through the matched pairs.

    On TPU backends the argmin pair comes from the fused Pallas kernel
    (ops/chamfer_pallas.py — one VMEM pass reduces each distance tile along
    both axes); UPP_DISABLE_PALLAS_CHAMFER=1 forces this chunked-XLA path."""
    from .chamfer_pallas import nn_both, should_dispatch
    if should_dispatch(xyz1.shape[1], xyz2.shape[1]):
        _, idx1, _, idx2 = nn_both(xyz1, xyz2, valid1, valid2)
    else:
        idx1 = jax.lax.stop_gradient(_nn_idx(xyz1, xyz2, valid2))
        idx2 = jax.lax.stop_gradient(_nn_idx(xyz2, xyz1, valid1))
    nn1 = jnp.take_along_axis(xyz2, idx1[..., None], axis=1)
    nn2 = jnp.take_along_axis(xyz1, idx2[..., None], axis=1)
    dist1 = jnp.sum((xyz1 - nn1) ** 2, axis=-1)
    dist2 = jnp.sum((xyz2 - nn2) ** 2, axis=-1)
    if valid1 is not None:
        dist1 = jnp.where(valid1, dist1, 0.0)
    if valid2 is not None:
        dist2 = jnp.where(valid2, dist2, 0.0)
    return dist1, idx1, dist2, idx2


def _masked_mean(d: jnp.ndarray, valid: Optional[jnp.ndarray]) -> jnp.ndarray:
    if valid is None:
        return jnp.mean(d)
    return jnp.sum(d) / jnp.maximum(jnp.sum(valid), 1)


def chamfer_raw(xyz1, xyz2, valid1=None, valid2=None):
    """(mean dist1, mean dist2) — building block for the L1/L2 reductions."""
    d1, _, d2, _ = nn_distance(xyz1, xyz2, valid1, valid2)
    return _masked_mean(d1, valid1), _masked_mean(d2, valid2)


def chamfer_l2(xyz1, xyz2, valid1=None, valid2=None):
    """ChamferDistanceL2: mean(d1) + mean(d2) of squared distances
    (``extensions/chamfer_dist/__init__.py:28-44``)."""
    m1, m2 = chamfer_raw(xyz1, xyz2, valid1, valid2)
    return m1 + m2


def chamfer_l2_split(xyz1, xyz2, valid1=None, valid2=None):
    """ChamferDistanceL2_split (``__init__.py:46-62``)."""
    return chamfer_raw(xyz1, xyz2, valid1, valid2)


def chamfer_l1(xyz1, xyz2, valid1=None, valid2=None, eps: float = 1e-12):
    """ChamferDistanceL1: (mean sqrt(d1) + mean sqrt(d2)) / 2
    (``__init__.py:64-85``). ``eps`` guards sqrt'(0)=inf for exactly-coincident
    points (the CUDA version relies on argmin never matching distance-0 pairs
    having gradient pathologies; here we clamp)."""
    d1, _, d2, _ = nn_distance(xyz1, xyz2, valid1, valid2)
    s1 = jnp.sqrt(jnp.maximum(d1, eps))
    s2 = jnp.sqrt(jnp.maximum(d2, eps))
    if valid1 is not None:
        s1 = jnp.where(valid1, s1, 0.0)
    if valid2 is not None:
        s2 = jnp.where(valid2, s2, 0.0)
    return (_masked_mean(s1, valid1) + _masked_mean(s2, valid2)) / 2.0


def chamfer_l1_per_sample(xyz1, xyz2, eps: float = 1e-12):
    """Per-sample [B] ChamferDistanceL1 — the reference evaluates CD one
    sample at a time (``tools/runner_pretask.py:359-385`` at bs=1); this
    returns the same per-sample values from one batched call so validation
    can run at the training batch size with identical meter averages."""
    d1, _, d2, _ = nn_distance(xyz1, xyz2)
    s1 = jnp.sqrt(jnp.maximum(d1, eps)).mean(axis=-1)
    s2 = jnp.sqrt(jnp.maximum(d2, eps)).mean(axis=-1)
    return (s1 + s2) / 2.0


def chamfer_l2_per_sample(xyz1, xyz2):
    """Per-sample [B] ChamferDistanceL2 (see ``chamfer_l1_per_sample``)."""
    d1, _, d2, _ = nn_distance(xyz1, xyz2)
    return d1.mean(axis=-1) + d2.mean(axis=-1)
