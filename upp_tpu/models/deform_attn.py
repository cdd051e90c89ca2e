"""Deformable local attention family — TPU-native.

Re-implements the deformable block components of the reference's
``models/Transformer_utils.py`` zoo (the ``rw_deform`` / ``deform`` /
``deform_graph`` style tokens of ``models/AdaPoinTr.py:15-311``):

* ``DeformableLocalAttention``      (rw_deform, ``Transformer_utils.py:159-266``)
* ``DeformableLocalCrossAttention`` (deform,    ``Transformer_utils.py:269-491``)
* ``DeformableGraphAttention``      (deform_graph, improvedDeformableLocal-
  GraphAttention, ``Transformer_utils.py:623-775``)

Shared recipe: kNN a local region per query token, predict a per-neighbour
3D offset from (region feats, query feat), shift the neighbour positions by
tanh(offset) (optionally scaled to the local ball), re-sample features at the
shifted positions by 3-NN inverse-distance interpolation (the CUDA
``three_nn``/``three_interpolate`` pair → here a fused top-3 + weighted-sum
einsum), then attend/graph-conv over the re-sampled region.

TPU notes: all gathers are ``take_along_axis`` over [B, N, k] index tensors
(XLA lowers these to efficient dynamic-gathers); the 3-NN interpolation is a
single [L, M] distance matmul + top-3, batched over (B·n_group); everything is
static-shape. The denoise-token split (AdaPoinTr's auxiliary task) uses a
masked-kNN instead of the reference's two concatenated kNN calls — identical
neighbour sets, one fused program.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.geometry import index_points
from ..ops.knn import knn


def _knn_idx(q_pos, v_pos, k: int, denoise_length: Optional[int] = None):
    """kNN indices of q_pos in v_pos; with denoise_length, regular queries
    (all but the last ``denoise_length``) only see regular keys — the masked
    equivalent of the reference's two-kNN split
    (``Transformer_utils.py:408-424``)."""
    if not denoise_length:
        return knn(q_pos, v_pos, k)[1]
    d = jnp.sum((q_pos[:, :, None] - v_pos[:, None]) ** 2, -1)
    nq, nv = q_pos.shape[1], v_pos.shape[1]
    key_is_denoise = (jnp.arange(nv) >= nv - denoise_length)[None, None, :]
    query_is_true = (jnp.arange(nq) < nq - denoise_length)[None, :, None]
    d = jnp.where(key_is_denoise & query_is_true, jnp.inf, d)
    return jax.lax.top_k(-d, k)[1]


def three_interpolate(qpos, v_pos, v, eps: float = 1e-8):
    """Inverse-distance 3-NN feature interpolation — the pointnet2
    ``three_nn`` + ``three_interpolate`` pair as one batched XLA program.

    Args: qpos [B, L, 3], v_pos [B, M, 3], v [B, M, C] → [B, L, C].
    Weights use squared distances (pointnet2 kernel semantics)."""
    d = jnp.sum((qpos[:, :, None] - v_pos[:, None]) ** 2, -1)       # [B, L, M]
    nd, idx = jax.lax.top_k(-d, 3)
    w = 1.0 / (-nd + eps)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    feats = index_points(v, idx)                                    # [B, L, 3, C]
    return jnp.sum(feats * w[..., None], axis=-2)


class _OffsetMLP(nn.Module):
    """linear_offset: Dense(dim) → LayerNorm → GELU → Dense(3, no bias)."""
    dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim, name="lin0")(x)
        h = nn.LayerNorm(name="norm")(h)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(3, use_bias=False, name="lin1")(h)


class DeformableLocalAttention(nn.Module):
    """'rw_deform': deformable region re-sample + local k x k self-attention,
    max-pooled back to the token (``Transformer_utils.py:159-266``)."""
    dim: int
    num_heads: int
    k: int = 10
    n_group: int = 2

    @nn.compact
    def __call__(self, x, pos, idx=None):
        B, N, C = x.shape
        H, hd = self.num_heads, C // self.num_heads
        if idx is None:
            idx = _knn_idx(pos, pos, self.k)
        q = nn.Dense(C, use_bias=False, name="proj_q")(x)
        v_off = nn.Dense(C, use_bias=False, name="proj_v_off")(x)
        # offsets come from proj_v_off feats; the re-sample source is raw x
        interp = _DeformResample(self.dim, self.k, self.n_group,
                                 name="resample")(q, v_off, x, pos, idx)

        # local self-attn among the k re-sampled neighbours, maxpool to token
        local_q = index_points(q, idx).reshape(B, N, self.k, H, hd)
        kf = nn.Dense(C, use_bias=False, name="proj_k")(interp) \
            .reshape(B, N, self.k, H, hd)
        vf = nn.Dense(C, use_bias=False, name="proj_v")(interp) \
            .reshape(B, N, self.k, H, hd)
        attn = jnp.einsum("bnkhd,bnmhd->bnhkm", local_q, kf,
                          preferred_element_type=jnp.float32) * hd ** -0.5
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bnhkm,bnmhd->bnkhd", attn, vf,
                         preferred_element_type=jnp.float32)
        out = jnp.max(out.reshape(B, N, self.k, C), axis=2)
        return nn.Dense(C, name="proj")(out)


class DeformableLocalCrossAttention(nn.Module):
    """'deform': deformable region re-sample + 1 x k cross-attention from the
    query token to its re-sampled region (``Transformer_utils.py:269-491``).
    Self-attn when v is None; supports the denoise-token split."""
    dim: int
    num_heads: int
    k: int = 10
    n_group: int = 2

    @nn.compact
    def __call__(self, q, q_pos, v=None, v_pos=None, idx=None,
                 denoise_length: Optional[int] = None):
        if v is None:
            v = q
        if v_pos is None:
            v_pos = q_pos
        B, N, C = q.shape
        H, hd = self.num_heads, C // self.num_heads
        if idx is None:
            idx = _knn_idx(q_pos, v_pos, self.k, denoise_length)
        qf = nn.Dense(C, use_bias=False, name="proj_q")(q)
        v_off = nn.Dense(C, use_bias=False, name="proj_v_off")(v)
        # offsets come from proj_v_off feats; the re-sample source is raw v
        interp = _DeformResample(self.dim, self.k, self.n_group,
                                 name="resample")(qf, v_off, v, v_pos, idx)
        qh = qf.reshape(B, N, 1, H, hd)
        kf = nn.Dense(C, use_bias=False, name="proj_k")(interp) \
            .reshape(B, N, self.k, H, hd)
        vf = nn.Dense(C, use_bias=False, name="proj_v")(interp) \
            .reshape(B, N, self.k, H, hd)
        attn = jnp.einsum("bnqhd,bnkhd->bnhqk", qh, kf,
                          preferred_element_type=jnp.float32) * hd ** -0.5
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bnhqk,bnkhd->bnqhd", attn, vf,
                         preferred_element_type=jnp.float32).reshape(B, N, C)
        return nn.Dense(C, name="proj")(out)


class _DeformResample(nn.Module):
    """Grouped offset prediction from (v_off region, q) + 3-NN re-sample of
    the raw value features at the shifted positions."""
    dim: int
    k: int
    n_group: int

    @nn.compact
    def __call__(self, q_g, v_off, v, v_pos, idx):
        B, N, C = q_g.shape
        g, c = self.n_group, C // self.n_group
        off_local = index_points(v_off, idx).reshape(B, N, self.k, g, c)
        group_q = q_g.reshape(B, N, 1, g, c)
        shift_feat = jnp.concatenate(
            [off_local, jnp.broadcast_to(group_q, off_local.shape)], axis=-1)
        offset = jnp.tanh(_OffsetMLP(self.dim, name="linear_offset")(shift_feat))
        local_pos = index_points(v_pos, idx)
        shift_pos = (local_pos[:, :, :, None, :] + offset) \
            .transpose(0, 3, 1, 2, 4).reshape(B * g, N * self.k, 3)
        M = v_pos.shape[1]
        pos_g = jnp.broadcast_to(v_pos[:, None], (B, g, M, 3)) \
            .reshape(B * g, M, 3)
        v_g = v.reshape(B, M, g, c).transpose(0, 2, 1, 3).reshape(B * g, M, c)
        interp = three_interpolate(shift_pos, pos_g, v_g)
        return interp.reshape(B, g, N, self.k, c).transpose(0, 2, 3, 1, 4) \
            .reshape(B, N, self.k, C)


class DeformableGraphAttention(nn.Module):
    """'deform_graph' (improvedDeformableLocalGraphAttention,
    ``Transformer_utils.py:623-775``): ungrouped offsets scaled to the local
    ball, 3-NN re-sample, then an edge-conv (knn_map + max) over the
    re-sampled region."""
    dim: int
    k: int = 10

    @nn.compact
    def __call__(self, q, q_pos, v=None, v_pos=None, idx=None,
                 denoise_length: Optional[int] = None):
        if v is None:
            v = q
        if v_pos is None:
            v_pos = q_pos
        B, N, C = q.shape
        if idx is None:
            idx = _knn_idx(q_pos, v_pos, self.k, denoise_length)
        v_off = nn.Dense(C, name="proj_v_off")(v)
        off_local = index_points(v_off, idx)                         # [B,N,k,C]
        qk = jnp.broadcast_to(q[:, :, None, :], off_local.shape)
        shift_feat = jnp.concatenate([off_local, qk], axis=-1)
        offset = jnp.tanh(_OffsetMLP(self.dim, name="linear_offset")(shift_feat))
        local_pos = index_points(v_pos, idx)                         # [B,N,k,3]
        # deform within the local ball: scale = half the region extent
        scale = 0.5 * (jnp.max(local_pos, axis=-2, keepdims=True)
                       - jnp.min(local_pos, axis=-2, keepdims=True))
        shift_pos = (local_pos + offset * scale).reshape(B, N * self.k, 3)
        interp = three_interpolate(shift_pos, v_pos, v) \
            .reshape(B, N, self.k, C)
        feats = jnp.concatenate([interp - qk, qk], axis=-1)
        h = nn.Dense(self.dim, name="knn_map")(feats)
        h = nn.leaky_relu(h, 0.2)
        return jnp.max(h, axis=2)
