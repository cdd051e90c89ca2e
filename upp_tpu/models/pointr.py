"""PoinTr completion model — TPU-native.

Re-implements the vendored PoinTr stack (``models/PoinTr.py:16-123``,
``models/Transformer.py`` PCTransformer/Block/DecoderBlock,
``models/dgcnn_group.py`` DGCNN_Grouper): DGCNN edge-conv grouper with FPS
downsampling 2048→512→128, a geometry-aware encoder (first ``knn_layer``
blocks merge kNN graph features into self-attention), coarse center query
generation, a cross-attention decoder, and a FoldingNet rebuild head.

Usable standalone (``PoinTr`` in the MODELS registry) and as the optional
external completion frontend of the unify runners (the commented
``pointr_model`` hooks at ``tools/runner_module.py:177-178,317-327``).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.chamfer import chamfer_l1
from ..ops.fps import fps
from ..ops.geometry import index_points
from ..ops.knn import knn
from .build import MODELS
from ..utils.config import to_config
from .layers import TorchBatchNorm, DropPath, Mlp, Attention, trunc_normal_init


def edge_features(coor_q, x_q, coor_k, x_k, k: int = 16):
    """DGCNN graph feature: concat(neighbour - center, center)
    (``dgcnn_group.py:90-112``). Returns [B, Nq, k, 2C]."""
    _, idx = knn(coor_q, coor_k, k)                        # [B, Nq, k]
    gathered = index_points(x_k, idx)                       # [B, Nq, k, C]
    center = jnp.broadcast_to(x_q[:, :, None, :], gathered.shape)
    return jnp.concatenate([gathered - center, center], axis=-1)


class _EdgeLayer(nn.Module):
    """Conv2d(k=1, no bias) + GroupNorm(4) + LeakyReLU + max over k."""
    out_ch: int

    @nn.compact
    def __call__(self, feats):                              # [B, N, k, C]
        x = nn.Dense(self.out_ch, use_bias=False, name="conv")(feats)
        x = nn.GroupNorm(num_groups=4, name="gn")(x)
        x = nn.leaky_relu(x, 0.2)
        return jnp.max(x, axis=2)                           # [B, N, out_ch]


class DGCNNGrouper(nn.Module):
    """EdgeConv ×4 with FPS downsample N→512→128 (``dgcnn_group.py:43-144``)."""
    n1: int = 512
    n2: int = 128

    @nn.compact
    def __call__(self, xyz):                                # [B, N, 3]
        coor = xyz
        f = nn.Dense(8, name="input_trans")(xyz)
        f = _EdgeLayer(32, name="layer1")(edge_features(coor, f, coor, f))
        coor_q, idx = fps(coor, self.n1)
        f_q = jnp.take_along_axis(f, idx[..., None], axis=1)
        f = _EdgeLayer(64, name="layer2")(edge_features(coor_q, f_q, coor, f))
        coor = coor_q
        f = _EdgeLayer(64, name="layer3")(edge_features(coor, f, coor, f))
        coor_q, idx = fps(coor, self.n2)
        f_q = jnp.take_along_axis(f, idx[..., None], axis=1)
        f = _EdgeLayer(128, name="layer4")(edge_features(coor_q, f_q, coor, f))
        return coor_q, f                                    # [B,128,3],[B,128,128]


def graph_feature_tokens(x, coor_q, coor_k, x_k, k: int = 8):
    """Token-space graph feature (``Transformer.py:58-68``)."""
    _, idx = knn(coor_q, coor_k, k)
    gathered = index_points(x_k, idx)                       # [B, Nq, k, C]
    center = jnp.broadcast_to(x[:, :, None, :], gathered.shape)
    return jnp.concatenate([gathered - center, center], axis=-1)


class KnnMerge(nn.Module):
    """knn_map (Linear 2C→C + LeakyReLU) → max over k → merge (Linear 2C→C)
    (``Transformer.py:176-190,247-255``)."""

    @nn.compact
    def __call__(self, attn_out, graph_feats):
        knn_f = nn.Dense(attn_out.shape[-1], name="knn_map")(graph_feats)
        knn_f = nn.leaky_relu(knn_f, 0.2)
        knn_f = jnp.max(knn_f, axis=2)
        merged = jnp.concatenate([attn_out, knn_f], axis=-1)
        return nn.Dense(attn_out.shape[-1], name="merge_map")(merged)


class PoinTrEncBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 2.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, coor=None, use_knn: bool = False,
                 deterministic: bool = True):
        dp = DropPath(self.drop_path)
        norm_x = nn.LayerNorm(name="norm1")(x)
        x1 = Attention(self.dim, self.num_heads, name="attn")(
            norm_x, deterministic=deterministic)
        if use_knn:
            gf = graph_feature_tokens(norm_x, coor, coor, norm_x, k=8)
            x1 = KnnMerge(name="knn")(x1, gf)
        x = x + dp(x1, deterministic=deterministic)
        x = x + dp(Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(
            nn.LayerNorm(name="norm2")(x), deterministic=deterministic),
            deterministic=deterministic)
        return x


class CrossAttention(nn.Module):
    """(``Transformer.py:119-152``)."""
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, q, v, deterministic: bool = True):
        B, N, _ = q.shape
        C, H = self.dim, self.num_heads
        hd = C // H
        scale = hd ** -0.5
        qm = nn.Dense(C, use_bias=False, name="q_map")(q).reshape(B, N, H, hd)
        km = nn.Dense(C, use_bias=False, name="k_map")(v).reshape(B, -1, H, hd)
        vm = nn.Dense(C, use_bias=False, name="v_map")(v).reshape(B, -1, H, hd)
        attn = jnp.einsum("bnhd,bmhd->bhnm", qm, km,
                          preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, vm,
                         preferred_element_type=jnp.float32).reshape(B, N, C)
        return nn.Dense(C, name="proj")(out)


class PoinTrDecBlock(nn.Module):
    """Self-attn (+knn merge) → cross-attn (+cross knn merge) → MLP
    (``Transformer.py:155-220``)."""
    dim: int
    num_heads: int
    mlp_ratio: float = 2.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, q, v, q_coor=None, v_coor=None, use_knn: bool = False,
                 deterministic: bool = True):
        dp = DropPath(self.drop_path)
        norm_q = nn.LayerNorm(name="norm1")(q)
        q1 = Attention(self.dim, self.num_heads, name="self_attn")(
            norm_q, deterministic=deterministic)
        if use_knn:
            gf = graph_feature_tokens(norm_q, q_coor, q_coor, norm_q, k=8)
            q1 = KnnMerge(name="knn")(q1, gf)
        q = q + dp(q1, deterministic=deterministic)

        norm_q2 = nn.LayerNorm(name="norm_q")(q)
        norm_v = nn.LayerNorm(name="norm_v")(v)
        q2 = CrossAttention(self.dim, self.num_heads, name="attn")(
            norm_q2, norm_v, deterministic=deterministic)
        if use_knn:
            gf = graph_feature_tokens(norm_q2, q_coor, v_coor, norm_v, k=8)
            q2 = KnnMerge(name="knn_cross")(q2, gf)
        q = q + dp(q2, deterministic=deterministic)
        q = q + dp(Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(
            nn.LayerNorm(name="norm2")(q), deterministic=deterministic),
            deterministic=deterministic)
        return q


class ConvBNLeaky(nn.Module):
    """Conv1d → BN → LeakyReLU → Conv1d stack (increase_dim / pos_embed /
    input_proj patterns of ``Transformer.py:277-296,311-316``)."""
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden, name="conv0")(x)
        x = TorchBatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        x = nn.leaky_relu(x, 0.2)
        return nn.Dense(self.out, name="conv1")(x)


class Fold(nn.Module):
    """FoldingNet rebuild (``PoinTr.py:16-58``): 2D seed grid folded twice."""
    in_channel: int
    step: int
    hidden_dim: int = 256

    @nn.compact
    def __call__(self, x, deterministic: bool = True):      # x: [BM, C]
        num_sample = self.step * self.step
        bm = x.shape[0]
        lin = jnp.linspace(-1.0, 1.0, self.step)
        a = jnp.tile(lin[None, :], (self.step, 1)).reshape(-1)
        b = jnp.tile(lin[:, None], (1, self.step)).reshape(-1)
        seed = jnp.stack([a, b], axis=-1)                    # [S, 2]
        seed = jnp.broadcast_to(seed[None], (bm, num_sample, 2))
        feat = jnp.broadcast_to(x[:, None, :], (bm, num_sample, self.in_channel))

        def folding(name, inp):
            h = nn.Dense(self.hidden_dim, name=f"{name}_c0")(inp)
            h = TorchBatchNorm(use_running_average=deterministic, momentum=0.9,
                             epsilon=1e-5, name=f"{name}_bn0")(h)
            h = nn.relu(h)
            h = nn.Dense(self.hidden_dim // 2, name=f"{name}_c1")(h)
            h = TorchBatchNorm(use_running_average=deterministic, momentum=0.9,
                             epsilon=1e-5, name=f"{name}_bn1")(h)
            h = nn.relu(h)
            return nn.Dense(3, name=f"{name}_c2")(h)

        fd1 = folding("folding1", jnp.concatenate([seed, feat], axis=-1))
        fd2 = folding("folding2", jnp.concatenate([fd1, feat], axis=-1))
        return fd2                                           # [BM, S, 3]


class PCTransformer(nn.Module):
    """Geometry-aware encoder/decoder (``Transformer.py:262-425``)."""
    embed_dim: int = 384
    depth_enc: int = 6
    depth_dec: int = 8
    num_heads: int = 6
    num_query: int = 224
    knn_layer: int = 1

    @nn.compact
    def __call__(self, inpc, deterministic: bool = True):
        coor, f = DGCNNGrouper(name="grouper")(inpc)
        pos = ConvBNLeaky(128, self.embed_dim, name="pos_embed")(
            coor, deterministic=deterministic)
        x = ConvBNLeaky(self.embed_dim, self.embed_dim, name="input_proj")(
            f, deterministic=deterministic)

        for i in range(self.depth_enc):
            x = PoinTrEncBlock(self.embed_dim, self.num_heads,
                               name=f"encoder{i}")(
                x + pos, coor=coor, use_knn=(i < self.knn_layer),
                deterministic=deterministic)

        bs = inpc.shape[0]
        glob = ConvBNLeaky(1024, 1024, name="increase_dim")(
            x, deterministic=deterministic)
        glob = jnp.max(glob, axis=1)                         # [B, 1024]
        h = nn.Dense(1024, name="coarse_pred0")(glob)
        h = nn.relu(h)
        coarse = nn.Dense(3 * self.num_query, name="coarse_pred1")(h)
        coarse = coarse.reshape(bs, self.num_query, 3)

        qf = jnp.concatenate(
            [jnp.broadcast_to(glob[:, None, :], (bs, self.num_query, 1024)),
             coarse], axis=-1)
        q = nn.Dense(1024, name="mlp_query0")(qf)
        q = nn.leaky_relu(q, 0.2)
        q = nn.Dense(1024, name="mlp_query1")(q)
        q = nn.leaky_relu(q, 0.2)
        q = nn.Dense(self.embed_dim, name="mlp_query2")(q)

        for i in range(self.depth_dec):
            q = PoinTrDecBlock(self.embed_dim, self.num_heads,
                               name=f"decoder{i}")(
                q, x, q_coor=coarse, v_coor=coor,
                use_knn=(i < self.knn_layer), deterministic=deterministic)
        return q, coarse


@MODELS.register_module("PoinTr")
class PoinTrModel(nn.Module):
    """(``PoinTr.py:60-123``). forward(xyz [B,N,3]) → (coarse, rebuilt)."""
    config: Any

    def setup(self):
        cfg = to_config(self.config)
        self.trans_dim = int(cfg.trans_dim)
        self.num_pred = int(cfg.num_pred)
        self.num_query = int(cfg.num_query)
        self.fold_step = int((self.num_pred // self.num_query) ** 0.5 + 0.5)
        self.base_model = PCTransformer(
            embed_dim=self.trans_dim, num_query=self.num_query,
            knn_layer=int(cfg.get("knn_layer", 1)))
        self.foldingnet = Fold(self.trans_dim, step=self.fold_step,
                               hidden_dim=256)
        self.increase_dim = ConvBNLeaky(1024, 1024)
        self.reduce_map = nn.Dense(self.trans_dim)

    def __call__(self, xyz, *, deterministic: bool = True):
        q, coarse = self.base_model(xyz, deterministic=deterministic)
        B, M, C = q.shape
        glob = jnp.max(self.increase_dim(q, deterministic=deterministic), axis=1)
        rebuild_feature = jnp.concatenate(
            [jnp.broadcast_to(glob[:, None, :], (B, M, 1024)), q, coarse],
            axis=-1)
        rebuild_feature = self.reduce_map(rebuild_feature.reshape(B * M, -1))
        rel = self.foldingnet(rebuild_feature,
                              deterministic=deterministic)   # [BM, S, 3]
        rebuild = (rel.reshape(B, M, -1, 3) + coarse[:, :, None, :]).reshape(B, -1, 3)

        inp_sparse, _ = fps(xyz, self.num_query)
        coarse_full = jnp.concatenate([coarse, inp_sparse], axis=1)
        rebuild_full = jnp.concatenate([rebuild, xyz], axis=1)
        return coarse_full, rebuild_full

    @staticmethod
    def get_loss(ret, gt):
        return chamfer_l1(ret[0], gt), chamfer_l1(ret[1], gt)
