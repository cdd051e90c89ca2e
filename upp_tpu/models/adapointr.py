"""AdaPoinTr — adaptive-query point cloud completion, TPU-native.

Re-implements ``models/AdaPoinTr.py`` (PCTransformer with adaptive query
generation + query ranking + auxiliary denoising task) and the block styles
from ``models/Transformer_utils.py`` that its released configs use:

* ``attn``         — plain global self/cross attention
* ``graph``        — DynamicGraphAttention (kNN edge-conv over token
  features, ``Transformer_utils.py:777-858``)
* ``rw_deform``    — DeformableLocalAttention (models/deform_attn.py)
* ``deform``       — DeformableLocalCrossAttention
* ``deform_graph`` — improvedDeformableLocalGraphAttention
* combined styles like ``attn-graph`` / ``attn-deform`` fuse a global and a
  local component via 'concat' (merge Dense) or 'onebyone' (sequential
  residuals), matching ``AdaPoinTr.py:15-311``.

The denoising task's attention mask (true queries must not attend to denoise
tokens, ``AdaPoinTr.py:217-237``) is a static additive mask since
denoise_length is a Python-level constant under jit.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.chamfer import chamfer_l1
from ..ops.fps import fps
from ..ops.geometry import index_points
from ..ops.knn import knn
from .build import MODELS
from ..utils.config import to_config
from .layers import Mlp, trunc_normal_init
from .pointr import DGCNNGrouper, Fold, ConvBNLeaky


class MaskedAttention(nn.Module):
    """Self attention with an optional additive mask [N, N] (1 = masked)."""
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        B, N, C = x.shape
        H = self.num_heads
        hd = C // H
        qkv = nn.Dense(3 * C, use_bias=False, kernel_init=trunc_normal_init,
                       name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32) * hd ** -0.5
        if mask is not None:
            attn = attn - 1e9 * mask[None, None]
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, kernel_init=trunc_normal_init, name="proj")(out)


class CrossAttn(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, q, v):
        B, N, C = q.shape
        H = self.num_heads
        hd = C // H
        qm = nn.Dense(C, use_bias=False, name="q_map")(q).reshape(B, N, H, hd)
        km = nn.Dense(C, use_bias=False, name="k_map")(v).reshape(B, -1, H, hd)
        vm = nn.Dense(C, use_bias=False, name="v_map")(v).reshape(B, -1, H, hd)
        attn = jnp.einsum("bnhd,bmhd->bhnm", qm, km,
                          preferred_element_type=jnp.float32) * hd ** -0.5
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, vm,
                         preferred_element_type=jnp.float32).reshape(B, N, C)
        return nn.Dense(C, name="proj")(out)


class DynamicGraphAttention(nn.Module):
    """kNN edge-conv over token features keyed by positions
    (``Transformer_utils.py:777-858``). Cross variant: queries gather
    neighbours from (v_pos, v)."""
    dim: int
    k: int = 10

    @nn.compact
    def __call__(self, x, pos, v=None, v_pos=None,
                 denoise_length: Optional[int] = None):
        src, src_pos = (v, v_pos) if v is not None else (x, pos)
        if denoise_length and v is None:
            # true queries only see true keys; denoise tokens see everything
            n = pos.shape[1]
            d = jnp.sqrt(jnp.maximum(
                jnp.sum((pos[:, :, None] - src_pos[:, None]) ** 2, -1), 0))
            key_is_denoise = (jnp.arange(n) >= n - denoise_length)[None, None, :]
            query_is_true = (jnp.arange(n) < n - denoise_length)[None, :, None]
            d = jnp.where(key_is_denoise & query_is_true, jnp.inf, d)
            idx = jax.lax.top_k(-d, self.k)[1]
        else:
            _, idx = knn(pos, src_pos, self.k)
        nbrs = index_points(src, idx)                          # [B, N, k, C]
        center = jnp.broadcast_to(x[:, :, None, :], nbrs.shape)
        feats = jnp.concatenate([nbrs - center, center], axis=-1)
        h = nn.Dense(self.dim, name="edge")(feats)
        h = nn.leaky_relu(h, 0.2)
        return jnp.max(h, axis=2)


def _style_tokens(style: str):
    """Split a block-style string into (has_attn, local_token). The local
    token is one of graph / rw_deform / deform / deform_graph or None
    (``AdaPoinTr.py:45-62``). '-' only separates 'attn' from the local part
    ('deform_graph' contains an underscore, not a dash)."""
    tokens = style.split("-")
    assert all(t in ("attn", "graph", "rw_deform", "deform", "deform_graph")
               for t in tokens), style
    local = next((t for t in tokens if t != "attn"), None)
    return "attn" in tokens, local


def _local_attn(local: str, dim: int, num_heads: int, name: str):
    from .deform_attn import (DeformableGraphAttention,
                              DeformableLocalAttention,
                              DeformableLocalCrossAttention)
    if local == "graph":
        return DynamicGraphAttention(dim, name=name)
    if local == "rw_deform":
        return DeformableLocalAttention(dim, num_heads, name=name)
    if local == "deform":
        return DeformableLocalCrossAttention(dim, num_heads, name=name)
    if local == "deform_graph":
        return DeformableGraphAttention(dim, name=name)
    raise ValueError(local)


class SelfAttnBlock(nn.Module):
    """(``AdaPoinTr.py:15-108``): any of attn / graph / rw_deform / deform /
    deform_graph, or attn-<local> combined via 'concat' or 'onebyone'."""
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    block_style: str = "attn"
    combine_style: str = "concat"

    @nn.compact
    def __call__(self, x, pos, mask=None, denoise_length=None):
        has_attn, local = _style_tokens(self.block_style)

        def run_local(h, name="local_attn"):
            m = _local_attn(local, self.dim, self.num_heads, name)
            if local == "rw_deform":
                return m(h, pos)
            return m(h, pos, denoise_length=denoise_length)

        if has_attn and local and self.combine_style == "onebyone":
            x = x + MaskedAttention(self.dim, self.num_heads, name="attn")(
                nn.LayerNorm(name="norm1")(x), mask)
            x = x + run_local(nn.LayerNorm(name="norm3")(x))
        else:
            norm_x = nn.LayerNorm(name="norm1")(x)
            feats = []
            if has_attn:
                feats.append(MaskedAttention(self.dim, self.num_heads,
                                             name="attn")(norm_x, mask))
            if local:
                feats.append(run_local(norm_x))
            f = feats[0] if len(feats) == 1 else nn.Dense(
                self.dim, name="merge_map")(jnp.concatenate(feats, -1))
            x = x + f
        x = x + Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(
            nn.LayerNorm(name="norm2")(x))
        return x


class CrossAttnBlock(nn.Module):
    """(``AdaPoinTr.py:110-311``): masked self-attn → cross-attn → MLP."""
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    self_style: str = "attn"
    cross_style: str = "attn"

    self_combine: str = "concat"
    cross_combine: str = "concat"

    @nn.compact
    def __call__(self, q, v, q_pos, v_pos, denoise_length: Optional[int] = None):
        mask = None
        if denoise_length:
            n = q.shape[1]
            mask = jnp.zeros((n, n)).at[: n - denoise_length,
                                        n - denoise_length:].set(1.0)
        has_attn, local = _style_tokens(self.self_style)

        def run_self_local(h, name="local_self_attn"):
            m = _local_attn(local, self.dim, self.num_heads, name)
            if local == "rw_deform":
                if denoise_length:
                    # the reference's DeformableLocalAttention.forward has no
                    # denoise_length parameter and raises TypeError on this
                    # combination — refuse rather than silently leak denoise
                    # tokens into true-query neighbourhoods
                    raise ValueError(
                        "rw_deform self-attention does not support the "
                        "denoise task (reference Transformer_utils.py:159)")
                return m(h, q_pos)
            return m(h, q_pos, denoise_length=denoise_length)

        if has_attn and local and self.self_combine == "onebyone":
            q = q + MaskedAttention(self.dim, self.num_heads,
                                    name="self_attn")(
                nn.LayerNorm(name="norm1")(q), mask)
            q = q + run_self_local(nn.LayerNorm(name="norm3")(q))
        else:
            norm_q = nn.LayerNorm(name="norm1")(q)
            feats = []
            if has_attn:
                feats.append(MaskedAttention(self.dim, self.num_heads,
                                             name="self_attn")(norm_q, mask))
            if local:
                feats.append(run_self_local(norm_q))
            f = feats[0] if len(feats) == 1 else nn.Dense(
                self.dim, name="self_attn_merge_map")(jnp.concatenate(feats, -1))
            q = q + f

        has_cattn, clocal = _style_tokens(self.cross_style)
        assert clocal != "rw_deform", "rw_deform is self-attn only (ref assert)"

        def run_cross_local(hq, hv, name="local_cross_attn"):
            m = _local_attn(clocal, self.dim, self.num_heads, name)
            return m(hq, q_pos, v=hv, v_pos=v_pos)

        if has_cattn and clocal and self.cross_combine == "onebyone":
            q = q + CrossAttn(self.dim, self.num_heads, name="cross_attn")(
                nn.LayerNorm(name="norm_q")(q), nn.LayerNorm(name="norm_v")(v))
            q = q + run_cross_local(nn.LayerNorm(name="norm_q_2")(q),
                                    nn.LayerNorm(name="norm_v_2")(v))
        else:
            norm_q2 = nn.LayerNorm(name="norm_q")(q)
            norm_v = nn.LayerNorm(name="norm_v")(v)
            feats = []
            if has_cattn:
                feats.append(CrossAttn(self.dim, self.num_heads,
                                       name="cross_attn")(norm_q2, norm_v))
            if clocal:
                feats.append(run_cross_local(norm_q2, norm_v))
            f = feats[0] if len(feats) == 1 else nn.Dense(
                self.dim, name="cross_attn_merge_map")(jnp.concatenate(feats, -1))
            q = q + f
        q = q + Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(
            nn.LayerNorm(name="norm2")(q))
        return q


class GeluMLP(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, kernel_init=trunc_normal_init, name="lin0")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, kernel_init=trunc_normal_init, name="lin1")(x)


class AdaPCTransformer(nn.Module):
    """(``AdaPoinTr.py:761-891``)."""
    embed_dim: int = 384
    enc_depth: int = 6
    dec_depth: int = 8
    num_heads: int = 6
    num_query: int = 256
    global_feature_dim: int = 1024
    enc_styles: Tuple[str, ...] = ("attn-graph",) + ("attn",) * 5
    dec_self_styles: Tuple[str, ...] = ("attn-graph",) + ("attn",) * 7
    dec_cross_styles: Tuple[str, ...] = ("attn-graph",) + ("attn",) * 7
    enc_combine: str = "concat"
    dec_self_combine: str = "concat"
    dec_cross_combine: str = "concat"
    denoise_length: int = 64

    @nn.compact
    def __call__(self, xyz, *, deterministic: bool = True):
        training = not deterministic
        bs = xyz.shape[0]
        coor, f = DGCNNGrouper(name="grouper")(xyz)
        pe = GeluMLP(128, self.embed_dim, name="pos_embed")(coor)
        x = GeluMLP(512, self.embed_dim, name="input_proj")(f)

        x = x + pe
        for i in range(self.enc_depth):
            x = SelfAttnBlock(self.embed_dim, self.num_heads,
                              block_style=self.enc_styles[i],
                              combine_style=self.enc_combine,
                              name=f"encoder{i}")(x, coor)

        glob = GeluMLP(1024, self.global_feature_dim, name="increase_dim")(x)
        glob = jnp.max(glob, axis=1)
        coarse = GeluMLP(1024, 3 * self.num_query, name="coarse_pred")(glob)
        coarse = coarse.reshape(bs, self.num_query, 3)
        coarse_inp, _ = fps(xyz, self.num_query // 2)
        coarse = jnp.concatenate([coarse, coarse_inp], axis=1)

        # query ranking: keep the top num_query of the 1.5x candidates
        # (AdaPoinTr.py:858-861)
        h = nn.Dense(256, name="query_ranking0")(coarse)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(256, name="query_ranking1")(h)
        h = nn.gelu(h, approximate=False)
        rank = nn.sigmoid(nn.Dense(1, name="query_ranking2")(h))[..., 0]
        order = jnp.argsort(-rank, axis=1)[:, :self.num_query]
        coarse = jnp.take_along_axis(coarse, order[..., None], axis=1)

        denoise_length = 0
        if training:
            picked, _ = fps(xyz, self.denoise_length)
            noise_rng = self.make_rng("denoise")
            picked = picked + jnp.clip(
                0.01 * jax.random.normal(noise_rng, picked.shape), -0.05, 0.05)
            coarse = jnp.concatenate([coarse, picked], axis=1)
            denoise_length = self.denoise_length

        qf = jnp.concatenate(
            [jnp.broadcast_to(glob[:, None, :],
                              (bs, coarse.shape[1], self.global_feature_dim)),
             coarse], axis=-1)
        q = nn.Dense(1024, name="mlp_query0")(qf)
        q = nn.gelu(q, approximate=False)
        q = nn.Dense(1024, name="mlp_query1")(q)
        q = nn.gelu(q, approximate=False)
        q = nn.Dense(self.embed_dim, name="mlp_query2")(q)

        for i in range(self.dec_depth):
            q = CrossAttnBlock(self.embed_dim, self.num_heads,
                               self_style=self.dec_self_styles[i],
                               cross_style=self.dec_cross_styles[i],
                               self_combine=self.dec_self_combine,
                               cross_combine=self.dec_cross_combine,
                               name=f"decoder{i}")(
                q, x, coarse, coor,
                denoise_length=denoise_length if training else None)
        return q, coarse, denoise_length


@MODELS.register_module("AdaPoinTr")
class AdaPoinTrModel(nn.Module):
    """(``AdaPoinTr.py:893-996``). Training returns
    (pred_coarse, denoised_coarse, denoised_fine, pred_fine); eval returns
    (coarse, rebuild)."""
    config: Any

    def setup(self):
        cfg = to_config(self.config)
        dec = cfg.get("decoder_config", cfg)
        self.trans_dim = int(dec.get("embed_dim", 384))
        self.num_query = int(cfg.num_query)
        self.num_points = cfg.get("num_points", None)
        self.decoder_type = cfg.get("decoder_type", "fc")
        self.fold_step = 8
        if self.decoder_type == "fold":
            self.factor = self.fold_step ** 2
            self.decode_head = Fold(self.trans_dim, step=self.fold_step,
                                    hidden_dim=256)
        else:
            step = (int(self.num_points) // self.num_query
                    if self.num_points else self.fold_step ** 2)
            self.factor = step
            self.rebuild_hidden = nn.Dense(512, name="rebuild_hidden")
            self.rebuild_out = nn.Dense(3 * step, name="rebuild_out")
        enc = cfg.get("encoder_config", cfg)
        enc_depth = int(enc.get("depth", 6))
        dec_depth = int(dec.get("depth", 8))

        def styles(node, key, depth, default_first="attn-graph"):
            lst = node.get(key, None)
            if lst is None:
                lst = [default_first] + ["attn"] * (depth - 1)
            assert len(lst) == depth, (key, lst, depth)
            return tuple(lst)

        # style lists / combine modes from the config, exactly the keys the
        # reference's PointTransformerEncoder/DecoderEntry expand
        # (``AdaPoinTr.py:389-476``); defaults = the released configs' zoo
        self.base_model = AdaPCTransformer(
            embed_dim=self.trans_dim, num_query=self.num_query,
            enc_depth=enc_depth, dec_depth=dec_depth,
            enc_styles=styles(enc, "block_style_list", enc_depth),
            enc_combine=str(enc.get("combine_style", "concat")),
            dec_self_styles=styles(dec, "self_attn_block_style_list", dec_depth),
            dec_self_combine=str(dec.get("self_attn_combine_style", "concat")),
            dec_cross_styles=styles(dec, "cross_attn_block_style_list", dec_depth),
            dec_cross_combine=str(dec.get("cross_attn_combine_style", "concat")))
        self.increase_dim = ConvBNLeaky(1024, 1024)
        self.reduce_map = nn.Dense(self.trans_dim)

    def __call__(self, xyz, *, deterministic: bool = True):
        q, coarse, denoise_length = self.base_model(
            xyz, deterministic=deterministic)
        B, M, C = q.shape
        glob = jnp.max(self.increase_dim(q, deterministic=deterministic), axis=1)
        feat = jnp.concatenate(
            [jnp.broadcast_to(glob[:, None, :], (B, M, 1024)), q, coarse], -1)
        if self.decoder_type == "fold":
            feat = self.reduce_map(feat.reshape(B * M, -1))
            rel = self.decode_head(feat, deterministic=deterministic)
            rebuild = rel.reshape(B, M, -1, 3) + coarse[:, :, None, :]
        else:
            feat = self.reduce_map(feat)                      # [B, M, C]
            # SimpleRebuildFCLayer (AdaPoinTr.py:737-758): concat global+token
            g2 = jnp.broadcast_to(jnp.max(feat, axis=1, keepdims=True),
                                  feat.shape)
            h = nn.gelu(self.rebuild_hidden(
                jnp.concatenate([g2, feat], -1)), approximate=False)
            rel = self.rebuild_out(h).reshape(B, M, self.factor, 3)
            rebuild = rel + coarse[:, :, None, :]

        if denoise_length:
            d = denoise_length
            pred_fine = rebuild[:, :-d].reshape(B, -1, 3)
            pred_coarse = coarse[:, :-d]
            denoised_fine = rebuild[:, -d:].reshape(B, -1, 3)
            denoised_coarse = coarse[:, -d:]
            return pred_coarse, denoised_coarse, denoised_fine, pred_fine
        return coarse, rebuild.reshape(B, -1, 3)

    def get_loss(self, ret, gt):
        """(``AdaPoinTr.py:924-946``): 0.5×denoise CD + coarse CD + fine CD."""
        pred_coarse, denoised_coarse, denoised_fine, pred_fine = ret
        _, idx = knn(denoised_coarse, gt, self.factor)
        target = index_points(gt, idx).reshape(gt.shape[0], -1, 3)
        loss_denoised = chamfer_l1(denoised_fine, target) * 0.5
        loss_recon = chamfer_l1(pred_coarse, gt) + chamfer_l1(pred_fine, gt)
        return loss_denoised, loss_recon
