"""Approximate Earth Mover's Distance — TPU-native.

Replaces the reference CUDA extension ``extensions/emd``
(``cuda/emd_kernel.cu``, Fan/Mo auction-style approxmatch). The algorithm is
10 rounds of exponentially sharpened soft assignment (levels -4^7 ... -4^-2,
then 0), each round being three dense matrix-vector passes over the pairwise
squared-distance matrix — a perfect ``lax.scan`` over MXU matmuls.

Numerics: the kernel computes ``exp(level * d)`` with level as low as -16384;
everything is kept in f32 (underflow flushes to 0 exactly like the CUDA
``__expf``).

The backward of ``match_cost`` treats the match matrix as a constant, exactly
mirroring the CUDA custom autograd (``emd_kernel.cu:286-358``,
``emd.py:5-23``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .geometry import square_distance

# levels j = 7..-2; j == -2 uses level 0 (emd_kernel.cu:45-49)
_LEVELS = tuple(-(4.0 ** j) for j in range(7, -2, -1)) + (0.0,)


def approx_match(xyz1: jnp.ndarray, xyz2: jnp.ndarray) -> jnp.ndarray:
    """Soft assignment matrix between two clouds.

    Args:
      xyz1: [B, n, 3]; xyz2: [B, m, 3]
    Returns:
      match: [B, m, n] (same layout as the CUDA kernel's output, which is
      indexed ``match[i, l, k]`` with l over xyz2 and k over xyz1).
    """
    B, n, _ = xyz1.shape
    m = xyz2.shape[1]
    f32 = jnp.float32
    # integer-division marginals (emd_kernel.cu:28-34)
    if n >= m:
        mult_l, mult_r = 1.0, float(n // m)
    else:
        mult_l, mult_r = float(m // n), 1.0

    d2 = square_distance(xyz1.astype(f32), xyz2.astype(f32))     # [B, n, m]

    def round_fn(state, level):
        remain_l, remain_r, match = state                         # [B,n],[B,m],[B,n,m]
        kern = jnp.exp(level * d2)                                 # [B, n, m]
        # pass 1: row ratios
        suml = 1e-9 + jnp.einsum("bnm,bm->bn", kern, remain_r,
                                 preferred_element_type=f32)
        ratio_l = remain_l / suml
        # pass 2: column consumption
        sumr = jnp.einsum("bnm,bn->bm", kern, ratio_l,
                          preferred_element_type=f32) * remain_r
        consumption = jnp.minimum(remain_r / (sumr + 1e-9), 1.0)
        ratio_r = consumption * remain_r
        remain_r = jnp.maximum(0.0, remain_r - sumr)
        # pass 3: transported mass
        w = kern * ratio_l[:, :, None] * ratio_r[:, None, :]       # [B, n, m]
        match = match + w
        remain_l = jnp.maximum(0.0, remain_l - jnp.sum(w, axis=2))
        return (remain_l, remain_r, match), None

    init = (jnp.full((B, n), mult_l, f32),
            jnp.full((B, m), mult_r, f32),
            jnp.zeros((B, n, m), f32))
    (_, _, match), _ = jax.lax.scan(round_fn, init, jnp.asarray(_LEVELS, f32))
    return jnp.swapaxes(match, 1, 2)                               # [B, m, n]


@jax.custom_vjp
def match_cost(xyz1: jnp.ndarray, xyz2: jnp.ndarray, match: jnp.ndarray) -> jnp.ndarray:
    """cost[b] = sum_{k,l} ||xyz1_k - xyz2_l||^2 * match[b,l,k]
    (emd_kernel.cu matchcost, squared distances).

    d2 is computed in f32 regardless of input dtype so the explicit-match
    path stays bitwise-comparable with the fused scan (:func:`_emd_scan`),
    which also promotes to f32 before ``square_distance``."""
    d2 = square_distance(xyz1.astype(jnp.float32),
                         xyz2.astype(jnp.float32))                 # [B, n, m]
    return jnp.einsum("bnm,bmn->b", d2, match, preferred_element_type=jnp.float32)


def _match_cost_fwd(xyz1, xyz2, match):
    return match_cost(xyz1, xyz2, match), (xyz1, xyz2, match)


def _match_cost_bwd(res, g):
    xyz1, xyz2, match = res
    m_nm = jnp.swapaxes(match, 1, 2)                               # [B, n, m]
    # grad1[k] = g * sum_l 2 (x1_k - x2_l) match[l,k]   (matchcostgrad1)
    row = jnp.sum(m_nm, axis=2)                                    # [B, n]
    grad1 = 2.0 * (xyz1 * row[..., None]
                   - jnp.einsum("bnm,bmc->bnc", m_nm, xyz2,
                                preferred_element_type=jnp.float32))
    col = jnp.sum(m_nm, axis=1)                                    # [B, m]
    grad2 = 2.0 * (xyz2 * col[..., None]
                   - jnp.einsum("bnm,bnc->bmc", m_nm, xyz1,
                                preferred_element_type=jnp.float32))
    g = g[:, None, None]
    return grad1 * g, grad2 * g, None


match_cost.defvjp(_match_cost_fwd, _match_cost_bwd)


def _emd_scan(xyz1: jnp.ndarray, xyz2: jnp.ndarray):
    """Fused approx-match + cost: one scan over the 10 levels accumulating
    only REDUCTIONS of the transported mass ``w = kern * ratio_l ⊗ ratio_r``
    — the cost bilinear form plus the four gradient residuals (row/col
    marginals, ``match @ xyz2``, ``matchᵀ @ xyz1``) — so neither ``w`` nor the
    [B, n, m] match matrix is ever materialized or carried. The unfused path
    reads+writes the match carry every round (~1 GB/round at bs 120, n=m=1024)
    and re-reads it three times in the backward; here the carry is O(B·n).

    Identical round recurrence to :func:`approx_match` (same suml/consumption
    updates, emd_kernel.cu:28-120); only the *outputs* are pre-reduced.
    """
    B, n, _ = xyz1.shape
    m = xyz2.shape[1]
    f32 = jnp.float32
    if n >= m:
        mult_l, mult_r = 1.0, float(n // m)
    else:
        mult_l, mult_r = float(m // n), 1.0
    x1, x2 = xyz1.astype(f32), xyz2.astype(f32)
    d2 = square_distance(x1, x2)                                   # [B, n, m]

    def round_fn(state, level):
        remain_l, remain_r, cost, row, col, mx2, mx1 = state
        kern = jnp.exp(level * d2)
        suml = 1e-9 + jnp.einsum("bnm,bm->bn", kern, remain_r,
                                 preferred_element_type=f32)
        ratio_l = remain_l / suml
        sumr = jnp.einsum("bnm,bn->bm", kern, ratio_l,
                          preferred_element_type=f32) * remain_r
        consumption = jnp.minimum(remain_r / (sumr + 1e-9), 1.0)
        ratio_r = consumption * remain_r
        remain_r = jnp.maximum(0.0, remain_r - sumr)
        # w-reductions as matvecs: Σ_m w = ratio_l·(kern@ratio_r), etc.
        rhs = jnp.concatenate([ratio_r[..., None], ratio_r[..., None] * x2],
                              axis=-1)                             # [B, m, 4]
        left = jnp.einsum("bnm,bmc->bnc", kern, rhs,
                          preferred_element_type=f32)              # [B, n, 4]
        w_row = ratio_l * left[..., 0]
        mx2 = mx2 + ratio_l[..., None] * left[..., 1:]
        lhs = jnp.concatenate([ratio_l[..., None], ratio_l[..., None] * x1],
                              axis=-1)                             # [B, n, 4]
        right = jnp.einsum("bnm,bnc->bmc", kern, lhs,
                           preferred_element_type=f32)             # [B, m, 4]
        col = col + ratio_r * right[..., 0]
        mx1 = mx1 + ratio_r[..., None] * right[..., 1:]
        cost = cost + jnp.einsum("bn,bnm,bm->b", ratio_l, d2 * kern, ratio_r,
                                 preferred_element_type=f32)
        row = row + w_row
        remain_l = jnp.maximum(0.0, remain_l - w_row)
        return (remain_l, remain_r, cost, row, col, mx2, mx1), None

    init = (jnp.full((B, n), mult_l, f32), jnp.full((B, m), mult_r, f32),
            jnp.zeros((B,), f32), jnp.zeros((B, n), f32),
            jnp.zeros((B, m), f32), jnp.zeros((B, n, 3), f32),
            jnp.zeros((B, m, 3), f32))
    (_, _, cost, row, col, mx2, mx1), _ = jax.lax.scan(
        round_fn, init, jnp.asarray(_LEVELS, f32))
    return cost, row, col, mx2, mx1


@jax.custom_vjp
def _emd_cost(xyz1: jnp.ndarray, xyz2: jnp.ndarray) -> jnp.ndarray:
    return _emd_scan(xyz1, xyz2)[0]


def _emd_cost_fwd(xyz1, xyz2):
    cost, row, col, mx2, mx1 = _emd_scan(xyz1, xyz2)
    return cost, (xyz1, xyz2, row, col, mx2, mx1)


def _emd_cost_bwd(res, g):
    # match treated as a constant wrt the inputs, exactly like
    # _match_cost_bwd / the CUDA custom autograd (emd_kernel.cu:286-358)
    xyz1, xyz2, row, col, mx2, mx1 = res
    g = g[:, None, None]
    grad1 = 2.0 * (xyz1 * row[..., None] - mx2) * g
    grad2 = 2.0 * (xyz2 * col[..., None] - mx1) * g
    return grad1, grad2


_emd_cost.defvjp(_emd_cost_fwd, _emd_cost_bwd)


def earth_mover_distance(xyz1: jnp.ndarray, xyz2: jnp.ndarray,
                         reduce_mean: bool = True) -> jnp.ndarray:
    """EMD loss: per-batch match cost / n, optionally batch-meaned
    (``extensions/emd/emd.py:26-49``). Uses the fused match+cost scan;
    :func:`approx_match` + :func:`match_cost` remain the explicit-match API
    (cross-checked equal in tests/test_ops_losses.py)."""
    cost = _emd_cost(xyz1, xyz2) / xyz1.shape[1]
    return jnp.mean(cost) if reduce_mean else cost
