"""Fused Pallas TPU kernel for furthest point sampling.

The XLA formulation (ops/fps.py) compiles to an on-device while-loop whose
per-iteration state (the [B, N] running distance table) round-trips HBM every
iteration. This kernel keeps the whole tile — coordinates and distance table —
resident in VMEM for all n_samples iterations:

  grid = (B / TILE_B,); per program:
    x, y, z   [TILE_B, N]  VMEM   (N on the lane dimension)
    dists     [TILE_B, N]  VMEM scratch
    per iteration (fori_loop):
      sel    = one-hot(cur) over N     → current point's coords via masked
                                         row-reductions (no dynamic lane
                                         indexing, which TPUs hate)
      d      = ||p - cur||² rowwise    → dists = min(dists, d)
      cur    = rowwise argmax(dists)   (lowest-index tie-break)
      out[i] = cur via masked row store

Validity is encoded in the initial distance table: valid slots start at 1e10,
invalid at -1.0 (d ≥ 0 keeps them -1, so they are never selected and never
shrink a distance); the start index is the first valid slot, derived in-kernel.
Numerically identical to ops.fps — tested in interpret mode and on device.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e10


def _fps_kernel(x_ref, y_ref, z_ref, init_ref, idx_ref, cx_ref, cy_ref,
                cz_ref, dists_ref, *, n_samples: int, s_out: int):
    # s_out = n_samples padded to a lane multiple: it sets the OUTPUT width
    # only; the selection loop runs the true n_samples iterations (output
    # lanes ≥ n_samples stay unwritten and are sliced off by the caller —
    # looping to s_out wasted up to 4× the distance-update work for
    # non-lane-multiple sample counts, e.g. the lvl2 fps(center, 32)).
    tile_b, n = init_ref.shape
    init = init_ref[:]
    dists_ref[:] = init
    x, y, z = x_ref[:], y_ref[:], z_ref[:]
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (tile_b, n), 1)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (tile_b, s_out), 1)

    # start = the explicit-start sentinel slot (init == 2*_BIG, see
    # fps_pallas_idx) if present, else the first valid slot (0 when
    # unmasked). The fori carry is a full (TILE_B, 128) lane tile:
    # (TILE_B, 1) scalars-per-row int tensors are below the int32 tile
    # minimum and intermittently mis-lower on this toolchain (observed
    # sporadic TPU worker faults).
    lane = 128
    s_explicit = jnp.min(jnp.where(init > 1.5 * _BIG, iota_n, n), axis=1,
                         keepdims=True)
    s_valid = jnp.min(jnp.where(init > 0.0, iota_n, n), axis=1, keepdims=True)
    start = jnp.where(s_explicit < n, s_explicit, s_valid)
    start = jnp.broadcast_to(start.astype(jnp.int32), (tile_b, lane))

    def body(i, cur_full):
        cur = cur_full[:, :1]                                    # [TILE_B, 1]
        idx_ref[:] = jnp.where(iota_s == i, cur, idx_ref[:])
        sel = (iota_n == cur).astype(x.dtype)                    # [TILE_B, N]
        cx = jnp.sum(x * sel, axis=1, keepdims=True)
        cy = jnp.sum(y * sel, axis=1, keepdims=True)
        cz = jnp.sum(z * sel, axis=1, keepdims=True)
        # emit the selected coordinates directly — saves the caller a
        # [B, S] row gather from HBM (multi-ms on this backend)
        cx_ref[:] = jnp.where(iota_s == i, cx, cx_ref[:])
        cy_ref[:] = jnp.where(iota_s == i, cy, cy_ref[:])
        cz_ref[:] = jnp.where(iota_s == i, cz, cz_ref[:])
        d = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
        nd = jnp.minimum(dists_ref[:], d)                        # -1 stays -1
        dists_ref[:] = nd
        m = jnp.max(nd, axis=1, keepdims=True)
        cand = jnp.where(nd == m, iota_n, n)
        nxt = jnp.min(cand, axis=1, keepdims=True).astype(jnp.int32)
        return jnp.broadcast_to(nxt, (tile_b, lane))

    jax.lax.fori_loop(0, n_samples, body, start)


def _auto_tile_b(B: int, n_padded: int) -> int:
    """Pick the batch tile for the selection loop. Two measured effects
    (v5e, B=120, 8192→1024): fatter tiles amortise per-iteration VPU latency
    (12.9 ms at tile 8 → 8.8 ms at tile 40), but padded rows are pure waste
    and dominate program count (tile 72 → 144 padded rows → 10.0 ms loses to
    tile 40 → 120 rows). So: among multiples of 8 whose 5 [tile, N] f32
    buffers (x/y/z/init + dists scratch) fit a ~12 MB VMEM budget, minimise
    total padded rows first, then program count."""
    budget = 12 * 1024 * 1024
    cap = budget // (5 * 4 * n_padded)
    cap = max(8, min(120, cap // 8 * 8))
    b_pad8 = ((B + 7) // 8) * 8
    if cap >= b_pad8:
        return b_pad8
    best = None
    for t in range(8, cap + 1, 8):
        progs = -(-B // t)
        rows = progs * t
        key = (rows, progs)
        if best is None or key < best[0]:
            best = (key, t)
    return best[1]


@functools.partial(jax.jit, static_argnames=("n_samples", "tile_b", "interpret"))
def fps_pallas_idx(xyz: jnp.ndarray, n_samples: int,
                   valid: Optional[jnp.ndarray] = None,
                   tile_b: Optional[int] = None,
                   interpret: bool = False,
                   start_idx: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Fused-kernel FPS: returns (idx [B, n_samples] int32, sampled coords
    [B, n_samples, 3]). Pads B to tile_b, N to a lane multiple, and
    n_samples to a lane multiple internally (padding sliced off)."""
    B, N, _ = xyz.shape
    if tile_b is None:
        tile_b = _auto_tile_b(B, N + ((-N) % 128))
    if start_idx is not None:
        start_idx = jnp.broadcast_to(start_idx.astype(jnp.int32), (B,))
    n_pad = (-N) % 128
    b_pad = (-B) % tile_b
    s_out = n_samples + ((-n_samples) % 128)
    pts = jax.lax.stop_gradient(xyz).astype(jnp.float32)
    x = pts[..., 0]
    y = pts[..., 1]
    z = pts[..., 2]
    if valid is None:
        init = jnp.full((B, N), _BIG, jnp.float32)
    else:
        v = jnp.broadcast_to(valid, (B, N))
        init = jnp.where(v, _BIG, -1.0).astype(jnp.float32)
    if start_idx is not None:
        # sentinel: the kernel starts at the slot holding 2*_BIG
        init = jnp.where(jnp.arange(N)[None, :] == start_idx[:, None],
                         2.0 * _BIG, init)
    if n_pad or b_pad:
        pad = ((0, b_pad), (0, n_pad))
        x = jnp.pad(x, pad)
        y = jnp.pad(y, pad)
        z = jnp.pad(z, pad)
        init = jnp.pad(init, pad, constant_values=-1.0)

    bp, np_ = init.shape
    row_spec = pl.BlockSpec((tile_b, np_), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile_b, s_out), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)
    idx, cx, cy, cz = pl.pallas_call(
        functools.partial(_fps_kernel, n_samples=n_samples, s_out=s_out),
        grid=(bp // tile_b,),
        in_specs=[row_spec, row_spec, row_spec, row_spec],
        out_specs=(out_spec,) * 4,
        out_shape=(jax.ShapeDtypeStruct((bp, s_out), jnp.int32),
                   jax.ShapeDtypeStruct((bp, s_out), jnp.float32),
                   jax.ShapeDtypeStruct((bp, s_out), jnp.float32),
                   jax.ShapeDtypeStruct((bp, s_out), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((tile_b, np_), jnp.float32)],
        interpret=interpret,
    )(x, y, z, init)
    coords = jnp.stack([cx[:B, :n_samples], cy[:B, :n_samples],
                        cz[:B, :n_samples]], axis=-1)
    return idx[:B, :n_samples], coords


def fps_pallas(xyz: jnp.ndarray, n_samples: int,
               valid: Optional[jnp.ndarray] = None,
               tile_b: Optional[int] = None, interpret: bool = False,
               start_idx: Optional[jnp.ndarray] = None
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for ops.fps.fps backed by the fused kernel.

    The sampled coordinates come straight out of the kernel (no HBM row
    gather). Gradients w.r.t. ``xyz`` still flow exactly as through
    ``take_along_axis``: the correction term below is identically zero in
    the forward value (t - t), so XLA's algebraic simplifier drops the
    gather from the forward program, while autodiff's transpose of the
    non-stopped gather (a scatter-add into xyz) remains in the backward —
    the same backward the gather formulation produces."""
    idx, sampled = fps_pallas_idx(xyz, n_samples, valid, tile_b=tile_b,
                                  interpret=interpret, start_idx=start_idx)
    sampled = sampled.astype(xyz.dtype)
    t = jnp.take_along_axis(xyz, idx[..., None], axis=1)
    sampled = sampled + (t - jax.lax.stop_gradient(t))
    return sampled, idx
