"""Fused Pallas TPU kernel: kNN search + neighbour gather in one pass.

Replaces the ``square_distance → lax.top_k → take_along_axis`` chain
(ops/knn.py + ops/geometry.index_points — the TPU-side stand-ins for the
reference's KNN_CUDA / pytorch3d.ops.knn_points, see
``models/Point_MAE_unify.py:56``). On v5e the XLA chain costs ~7 ms for the
flagship's [120, 64, 1096] k=32 grouping (top_k lowers to a full per-row sort;
take_along_axis lowers to a scalar gather); this kernel keeps the [TILE_S, N]
distance tile, the k-selection state and the gathered coordinates resident in
VMEM and runs the whole thing in <1 ms:

  grid = (B / BT, S / TILE_S); per program (BT batch rows folded into the
  block to amortise grid-program launch overhead, VMEM-budgeted):
    q        [BT, TILE_S, 128]  VMEM   (xyz in lanes 0..2)
    px/py/pz [BT, 1, N]          VMEM   (coordinate rows, N on lanes)
    D        [BT, TILE_S, N]     VMEM scratch (broadcast-form sq. distances)
    k iterations (fori_loop):
      m    = rowwise min(D)
      nxt  = rowwise first index attaining m     (top_k tie-break: lowest idx)
      out lanes j: idx/dist (buffer 0), nbx/nby/nbz (buffer 1) via masked
      lane writes; D = where(col == nxt, BIG, D)

Outputs are packed into two [B, S, 128] f32 buffers (lane layout documented
in ``knn_gather``) because TPU output tiles need 128 lanes; k ≤ 42.

Differentiability: the selected indices are integer outputs (no gradient);
squared distances and gathered coordinates get a custom VJP —
  d_j  = ||q - nb_j||²   →  ∂d/∂q = 2(q-nb_j), ∂d/∂nb_j = -2(q-nb_j)
  nb_j = points[idx_j]   →  ∂nb/∂points = scatter-add over idx
matching exactly what autodiff produces through the XLA gather chain (tested
against it in tests/test_knn_pallas.py).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30


def _knn_kernel(q_ref, px_ref, py_ref, pz_ref, packed_ref, *rest, k: int,
                n_real: int, gather: bool = True):
    # outputs-then-scratch: (packed_ref, [nb_ref], d_ref). gather=False skips
    # the neighbour-coordinate reductions AND the second output DMA — pure
    # kNN callers (PoinTr/AdaPoinTr/deform idx-only sites) otherwise pay 3
    # masked reductions per k iteration plus a dead [B, S, 128] HBM write.
    nb_ref = rest[0] if gather else None
    d_ref = rest[-1]
    bt, tile_s, _ = q_ref.shape
    n = px_ref.shape[2]
    qx = q_ref[:, :, 0:1]                                     # [BT, TILE_S, 1]
    qy = q_ref[:, :, 1:2]
    qz = q_ref[:, :, 2:3]
    px, py, pz = px_ref[:], py_ref[:], pz_ref[:]              # [BT, 1, N]
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (bt, tile_s, n), 2)
    lane = jax.lax.broadcasted_iota(jnp.int32, (bt, tile_s, 128), 2)

    d = (qx - px) ** 2 + (qy - py) ** 2 + (qz - pz) ** 2      # [BT, TILE_S, N]
    # padded columns can never be selected
    d = jnp.where(iota_n >= n_real, _BIG, d)
    d_ref[:] = d

    packed_ref[:] = jnp.zeros((bt, tile_s, 128), jnp.float32)
    if gather:
        nb_ref[:] = jnp.zeros((bt, tile_s, 128), jnp.float32)

    def body(j, _):
        dcur = d_ref[:]
        m = jnp.min(dcur, axis=-1, keepdims=True)             # [BT, TILE_S, 1]
        cand = jnp.where(dcur == m, iota_n, n)
        nxt = jnp.min(cand, axis=-1, keepdims=True)           # [BT, TILE_S, 1]
        # buffer 0: lanes [0:k) idx (as f32, exact for N < 2^24), [k:2k) dist
        packed_ref[:] = jnp.where(lane == j, nxt.astype(jnp.float32),
                                  jnp.where(lane == k + j, m, packed_ref[:]))
        if gather:
            sel = (iota_n == nxt).astype(jnp.float32)
            nbx = jnp.sum(px * sel, axis=-1, keepdims=True)
            nby = jnp.sum(py * sel, axis=-1, keepdims=True)
            nbz = jnp.sum(pz * sel, axis=-1, keepdims=True)
            # buffer 1: lanes [0:k) nbx, [k:2k) nby, [2k:3k) nbz
            nb_ref[:] = jnp.where(lane == j, nbx,
                                  jnp.where(lane == k + j, nby,
                                            jnp.where(lane == 2 * k + j, nbz,
                                                      nb_ref[:])))
        d_ref[:] = jnp.where(iota_n == nxt, _BIG, dcur)
        return 0

    jax.lax.fori_loop(0, k, body, 0)


def _auto_bt(B: int, ts: int, np_: int) -> int:
    """Batch rows per program: grid programs run sequentially, so folding
    batch into the block amortises launch overhead for small-S groupings.
    Budget: ~2 MB for the [bt, ts, N] distance scratch — Mosaic's stack also
    holds several temporaries of the same shape inside the selection loop
    (measured: a 5.9 MB scratch OOM'd the 16 MB scoped VMEM)."""
    budget = 2 * 1024 * 1024
    bt = max(1, min(B, budget // (4 * ts * np_)))
    while B % bt:        # avoid padded batch rows (pure waste)
        bt -= 1
    return bt


@functools.partial(jax.jit,
                   static_argnames=("k", "tile_s", "interpret", "gather"))
def _knn_gather_fwd_impl(query: jnp.ndarray, points: jnp.ndarray, k: int,
                         tile_s: int = 128,
                         interpret: Optional[bool] = None,
                         gather: bool = True):
    if interpret is None:  # CPU has no Mosaic backend: interpret there
        interpret = jax.default_backend() == "cpu"
    B, S, _ = query.shape
    N = points.shape[1]
    assert 3 * k <= 128, f"k={k} too large for the packed lane layout"
    q = jax.lax.stop_gradient(query).astype(jnp.float32)
    p = jax.lax.stop_gradient(points).astype(jnp.float32)

    # query tile: multiple of 8 (f32 sublane) so Mosaic can lower any S
    ts = min(tile_s, max(8, -(-S // 8) * 8))
    s_pad = (-S) % ts
    n_pad = (-N) % 128
    qp = jnp.pad(q, ((0, 0), (0, s_pad), (0, 125)))
    px = jnp.pad(p[..., 0], ((0, 0), (0, n_pad)))[:, None]   # [B, 1, N]
    py = jnp.pad(p[..., 1], ((0, 0), (0, n_pad)))[:, None]
    pz = jnp.pad(p[..., 2], ((0, 0), (0, n_pad)))[:, None]

    sp, np_ = S + s_pad, N + n_pad
    bt = _auto_bt(B, ts, np_)
    q_spec = pl.BlockSpec((bt, ts, 128), lambda b, s: (b, s, 0),
                          memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((bt, 1, np_), lambda b, s: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bt, ts, 128), lambda b, s: (b, s, 0),
                            memory_space=pltpu.VMEM)

    n_out = 2 if gather else 1
    out = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, n_real=N, gather=gather),
        grid=(B // bt, sp // ts),
        in_specs=[q_spec, row_spec, row_spec, row_spec],
        out_specs=(out_spec,) * n_out,
        out_shape=tuple(jax.ShapeDtypeStruct((B, sp, 128), jnp.float32)
                        for _ in range(n_out)),
        scratch_shapes=[pltpu.VMEM((bt, ts, np_), jnp.float32)],
        interpret=interpret,
    )(qp, px, py, pz)

    packed = out[0]
    idx = packed[:, :S, :k].astype(jnp.int32)
    dists = packed[:, :S, k:2 * k]
    if not gather:
        return dists, idx, None
    nb = out[1]
    nbr = jnp.stack([nb[:, :S, :k], nb[:, :S, k:2 * k],
                     nb[:, :S, 2 * k:3 * k]], axis=-1)        # [B, S, k, 3]
    return dists, idx, nbr


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def knn_gather(query: jnp.ndarray, points: jnp.ndarray, k: int
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused kNN + gather: (sq_dists [B,S,k], idx [B,S,k], nbr [B,S,k,3]).

    Ascending by distance, ties broken by lowest index (lax.top_k semantics).
    Gradients flow through sq_dists and nbr exactly as through the XLA
    ``square_distance → top_k → take_along_axis`` chain.
    """
    d, idx, nbr = _knn_gather_fwd_impl(query, points, k)
    # recompute dists/nbr "symbolically" so downstream sees the same values
    # but with the right dtype promotion
    return d, idx, nbr.astype(points.dtype)


def _knn_gather_fwd(query, points, k):
    d, idx, nbr = knn_gather(query, points, k)
    return (d, idx, nbr), (query, points, idx, nbr)


def _knn_gather_bwd(k, res, cotangents):
    query, points, idx, nbr = res
    g_d, _, g_nb = cotangents
    qf = query.astype(jnp.float32)
    diff = qf[:, :, None, :] - nbr.astype(jnp.float32)        # [B,S,k,3]
    # d_j = ||q - nb_j||^2
    g_q = jnp.sum(2.0 * g_d[..., None] * diff, axis=2)
    g_p_rows = g_nb.astype(jnp.float32) - 2.0 * g_d[..., None] * diff
    B, S, _ = idx.shape
    N = points.shape[1]
    flat_idx = idx.reshape(B, S * k)
    # scatter-add as a one-hot MXU matmul: 3x faster than lax.scatter_add on
    # v5e (1.6 vs 5.0 ms at [120, 2048]→[120, 1096, 3]) and exact (0/1
    # weights, f32 accumulate)
    onehot = (flat_idx[..., None] == jnp.arange(N)).astype(jnp.float32)
    g_points = jnp.einsum("bsn,bsc->bnc", onehot,
                          g_p_rows.reshape(B, S * k, 3),
                          preferred_element_type=jnp.float32)
    return g_q.astype(query.dtype), g_points.astype(points.dtype)


knn_gather.defvjp(_knn_gather_fwd, _knn_gather_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def knn_idx(query: jnp.ndarray, points: jnp.ndarray, k: int
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather-free fused kNN: (sq_dists [B,S,k], idx [B,S,k]).

    Same selection as ``knn_gather`` but skips the neighbour-coordinate
    reductions and the second output DMA — for idx-only call sites
    (PoinTr/AdaPoinTr/deform attention). Distance gradients match the XLA
    chain; the neighbour gather needed for the backward runs there lazily
    (and is DCE'd when sq_dists is unused)."""
    d, idx, _ = _knn_gather_fwd_impl(query, points, k, gather=False)
    return d, idx


def _knn_idx_fwd(query, points, k):
    d, idx = knn_idx(query, points, k)
    return (d, idx), (query, points, idx)


def _knn_idx_bwd(k, res, cotangents):
    query, points, idx = res
    g_d, _ = cotangents
    from .geometry import index_points
    nbr = index_points(points, idx)
    g_q, g_p = _knn_gather_bwd(
        k, (query, points, idx, nbr),
        (g_d, None, jnp.zeros(nbr.shape, jnp.float32)))
    return g_q, g_p


knn_idx.defvjp(_knn_idx_fwd, _knn_idx_bwd)


def use_pallas_knn() -> bool:
    if os.environ.get("UPP_FORCE_PALLAS_KNN"):   # tests: interpret on CPU
        return True
    return (jax.default_backend() == "tpu"
            and not os.environ.get("UPP_DISABLE_PALLAS_KNN"))


def should_dispatch(n: int, k: int) -> bool:
    """Single home for the Pallas-vs-portable kNN dispatch predicate.

    Pallas wins when the source set is large (XLA ``top_k`` lowers to a full
    per-row sort); for small N the lane padding + per-tile selection loop
    loses to XLA. k ≤ 42 is the packed-lane-layout limit (3k ≤ 128).

    NOTE: callers evaluate this at TRACE time inside jitted functions —
    flipping UPP_DISABLE_PALLAS_KNN / UPP_FORCE_PALLAS_KNN after a shape has
    been traced has no effect until the jit cache is cleared.
    """
    return use_pallas_knn() and n >= 256 and k <= 42


def knn_gather_reference(query, points, k):
    """XLA formulation (CPU path + parity oracle): identical semantics."""
    from .geometry import index_points
    d = (jnp.sum(query.astype(jnp.float32) ** 2, -1)[..., None]
         + jnp.sum(points.astype(jnp.float32) ** 2, -1)[:, None, :]
         - 2.0 * jnp.einsum("bsd,bnd->bsn", query.astype(jnp.float32),
                            points.astype(jnp.float32)))
    neg, idx = jax.lax.top_k(-d, k)
    idx = idx.astype(jnp.int32)
    nbr = index_points(points, idx)
    dsel = jnp.take_along_axis(d, idx, axis=-1)
    return dsel, idx, nbr
