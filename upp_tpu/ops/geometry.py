"""Elementary batched point-geometry primitives.

TPU notes: ``square_distance`` is the single hottest primitive in the stack
(kNN, propagation, Chamfer and EMD all sit on it). It is expressed as one
batched matmul plus rank-1 corrections so XLA lowers the O(N*M) work onto the
MXU instead of the VPU.

Reference semantics: ``models/modules.py:13-51`` (square_distance,
index_points)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def square_distance(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared euclidean distances.

    Args:
      src: [B, N, C]
      dst: [B, M, C]
    Returns:
      [B, N, M] with d[b,n,m] = ||src[b,n] - dst[b,m]||^2
    """
    # -2 src·dstᵀ rides the MXU; the squared-norm terms broadcast on the VPU.
    # HIGHEST precision: distances feed argmin/top_k decisions (kNN, Chamfer,
    # FPS neighbourhoods) where bf16 rounding flips neighbour choices.
    dist = -2.0 * jnp.einsum("bnc,bmc->bnm", src, dst,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    dist = dist + jnp.sum(src.astype(jnp.float32) ** 2, axis=-1)[..., :, None]
    dist = dist + jnp.sum(dst.astype(jnp.float32) ** 2, axis=-1)[..., None, :]
    return dist


def index_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched gather along the point axis.

    Args:
      points: [B, N, C]
      idx:    [B, ...] integer indices into the N axis.
    Returns:
      [B, ..., C]
    """
    B = points.shape[0]
    lead = idx.shape[1:]
    flat = idx.reshape(B, -1)                                   # [B, K]
    out = jnp.take_along_axis(points, flat[..., None], axis=1)   # [B, K, C]
    return out.reshape((B,) + lead + (points.shape[-1],))
