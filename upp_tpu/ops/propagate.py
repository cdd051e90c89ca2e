"""Inverse-distance-weighted feature propagation (upsampling).

Replaces the reference's ``propagate`` (``models/Point_MAE_unify.py:22-48``)
and the interpolation core of ``PointNetFeaturePropagation``
(``Point_MAE_unify.py:351-387``). The neighbour search reuses the MXU-friendly
pairwise-distance + top_k pattern instead of a full sort.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .geometry import index_points


@partial(jax.jit, static_argnames=("k",))
def inverse_distance_interp(xyz1: jnp.ndarray, xyz2: jnp.ndarray,
                            feats2: jnp.ndarray, k: int = 16,
                            eps: float = 1e-4) -> jnp.ndarray:
    """Interpolate features from sparse points xyz2 onto dense points xyz1.

    Args:
      xyz1:   [B, N, 3] target positions.
      xyz2:   [B, S, 3] source positions.
      feats2: [B, S, D] source features.
      k:      neighbours to blend (reference uses 6/8/16 depending on caller).
      eps:    distance regulariser (1e-8 / 1e-3 / 1e-4 across call sites).
    Returns:
      [B, N, D] interpolated features.
    """
    from .knn import knn
    S = xyz2.shape[1]
    kk = min(k, S)
    dk, idx = knn(xyz1, xyz2, kk)                       # ascending distances
    # the XLA kNN path's matmul-form distances (-2qk+|q|²+|k|²) can round a
    # self-distance to ~-2e-7; with eps as small as 1e-8 the weight would be
    # a huge/wrong-signed 1/(d+eps). Clamp at 0 (the torch reference inherits
    # the same hazard from square_distance; clamping only changes degenerate
    # coincident-point cases).
    w = 1.0 / (jnp.maximum(dk, 0.0) + eps)              # [B, N, k]
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    if S <= 256:
        # small source set: express the weighted gather as a dense [N, S]
        # mixing matrix → one MXU matmul. Backward is a matmul too, avoiding
        # TPU scatter-adds (and a distinct gather HLO, which is slow to
        # compile on this backend).
        mix = jnp.sum((idx[..., None] == jnp.arange(S)) * w[..., None],
                      axis=2)                            # [B, N, S]
        return jnp.einsum("bns,bsd->bnd", mix, feats2,
                          preferred_element_type=jnp.float32)
    gathered = index_points(feats2, idx)                # [B, N, k, D]
    return jnp.sum(gathered * w[..., None], axis=2)


def propagate(xyz1, xyz2, points1, points2, de_neighbors: int = 64,
              dist_e: float = 1e-8):
    """Residual propagation: points1 + 0.3 * interp(points2)
    (``models/Point_MAE_unify.py:22-48``)."""
    interp = inverse_distance_interp(xyz1, xyz2, points2, k=de_neighbors, eps=dist_e)
    return points1 + 0.3 * interp
