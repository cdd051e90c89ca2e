"""k-nearest-neighbour search — TPU-native.

Replaces the reference's CUDA deps ``KNN_CUDA`` (``models/Point_MAE_unify.py:56``)
and ``pytorch3d.ops.knn_points`` (``models/Point_MAE_pretask_dev.py:680``).

The pairwise distance matrix is one MXU matmul (see ``geometry.square_distance``)
followed by ``lax.top_k`` over the negated distances; k ≤ 64 everywhere in the
workload so top-k is cheap relative to the matmul.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .geometry import square_distance, index_points


@partial(jax.jit, static_argnames=("k",))
def knn(query: jnp.ndarray, points: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """For each query, the k nearest of ``points`` (squared distances).

    On TPU backends this dispatches to the fused Pallas kernel
    (ops/knn_pallas.py) — the XLA ``top_k`` lowers to a full per-row sort and
    dominates the model's forward pass otherwise. UPP_DISABLE_PALLAS_KNN=1
    forces the portable path (also the CPU path). NOTE: the env switch is
    read at TRACE time; set it before the first call for a given shape, or
    call ``knn.clear_cache()`` afterwards — a cached jit keeps whichever
    path it was traced with.

    Args:
      query:  [B, S, 3]
      points: [B, N, 3]
    Returns:
      (sq_dists [B, S, k] ascending, idx [B, S, k] int32)
    """
    from .knn_pallas import knn_idx, should_dispatch
    if should_dispatch(points.shape[1], k):
        return knn_idx(query, points, k)   # gather-free kernel variant
    sq = square_distance(query, points)           # [B, S, N]
    n = points.shape[1]
    if k > n:
        # degenerate (k > N): pad by repeating the farthest neighbour, like
        # gathering with replacement — keeps shapes static for tiny inputs.
        neg, idx = jax.lax.top_k(-sq, n)
        pad = k - n
        neg = jnp.concatenate([neg, jnp.repeat(neg[..., -1:], pad, axis=-1)], -1)
        idx = jnp.concatenate([idx, jnp.repeat(idx[..., -1:], pad, axis=-1)], -1)
    else:
        neg, idx = jax.lax.top_k(-sq, k)
    return -neg, idx.astype(jnp.int32)


@partial(jax.jit, static_argnames=("k",))
def knn_points(query: jnp.ndarray, points: jnp.ndarray, k: int
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """pytorch3d.ops.knn_points analogue: also gathers the neighbour xyz.

    Returns (sq_dists [B,S,k], idx [B,S,k], nn_xyz [B,S,k,3])."""
    from .knn_pallas import knn_gather, should_dispatch
    if should_dispatch(points.shape[1], k):
        return knn_gather(query, points, k)       # gather fused in-kernel
    d, idx = knn(query, points, k)
    return d, idx, index_points(points, idx)


def knn_vectors_mean(noise_pts: jnp.ndarray, clean_pts: jnp.ndarray, k: int = 4) -> jnp.ndarray:
    """Mean displacement from each noise point to its K nearest clean points.

    This is the Rectification Prompter's supervision target
    (``models/Point_MAE_pretask_dev.py:680-683``): K=4 clean neighbours, mean of
    (neighbour - noise_point)."""
    _, _, nn_xyz = knn_points(noise_pts, clean_pts, k)
    return jnp.mean(nn_xyz - noise_pts[:, :, None, :], axis=-2)
