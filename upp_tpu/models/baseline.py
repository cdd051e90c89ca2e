"""Baseline (non-prompted) models: Point_MAE pretraining and PointTransformer
full fine-tune classification.

Re-implements ``models/Point_MAE_cp.py:239-596``. The random masking loop of
``MaskTransformer._mask_center_rand`` (host numpy per sample) becomes a
batched on-device ``jax.random.permutation``; the boolean-mask gathers become
fixed-shape index gathers (mask count is static given the mask ratio).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.chamfer import chamfer_l1, chamfer_l2
from ..ops.group import group_points
from .blocks import PrompterConfig
from .scan_blocks import ScannedDecoderStack, ScannedEncoderStack
from .build import MODELS
from ..utils.config import to_config
from .layers import Encoder, PosEmbedMLP, trunc_normal_init


@MODELS.register_module("Point_MAE")
class PointMAE(nn.Module):
    """Vanilla Point-MAE (``Point_MAE_cp.py:239-465``): random 60% group
    masking, encoder over visible tokens, 4-block decoder with mask tokens,
    Conv1d rebuild head, Chamfer loss against the masked neighbourhoods."""
    config: Any

    def setup(self):
        cfg = to_config(self.config)
        tc = cfg.transformer_config
        self.trans_dim = tc.trans_dim
        self.num_group = cfg.num_group
        self.group_size = cfg.group_size
        self.mask_ratio = tc.mask_ratio
        # bf16 matmuls with f32 accumulation in the block stacks (the
        # reference's `if_half` knob). The pretrain step is MXU-bound
        # (full-param bwd + AdamW), unlike the geometry-bound PEFT step
        # where bf16 measured neutral — see BASELINE.md round-4 table.
        cdtype = jnp.bfloat16 if bool(cfg.get("if_half", False)) else jnp.float32
        self.encoder = Encoder(tc.encoder_dims, compute_dtype=cdtype)
        self.pos_embed = PosEmbedMLP(tc.trans_dim)
        self.blocks = ScannedEncoderStack(
            embed_dim=tc.trans_dim, depth=tc.depth, num_heads=tc.num_heads,
            drop_path_rate=tc.drop_path_rate, plain=True,
            compute_dtype=cdtype, unroll=cfg.get("scan_unroll", None))
        self.norm = nn.LayerNorm()
        self.decoder_pos_embed = PosEmbedMLP(tc.trans_dim)
        self.MAE_decoder = ScannedDecoderStack(
            embed_dim=tc.trans_dim, depth=tc.decoder_depth,
            num_heads=tc.decoder_num_heads, drop_path_rate=tc.drop_path_rate,
            adapters=False, compute_dtype=cdtype,
            unroll=cfg.get("scan_unroll", None))
        self.increase_dim = nn.Dense(3 * self.group_size, name="increase_dim_conv")
        self.mask_token = self.param("mask_token", trunc_normal_init,
                                     (1, 1, tc.trans_dim))
        self.loss_type = cfg.get("loss", "cdl2")

    def _rand_mask_idx(self, B: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Per-sample random split of group indices into (visible, masked)."""
        G = self.num_group
        num_mask = int(self.mask_ratio * G)
        rng = self.make_rng("mask")
        perm = jax.vmap(lambda k: jax.random.permutation(k, G))(
            jax.random.split(rng, B))
        return perm[:, :G - num_mask], perm[:, G - num_mask:]

    def __call__(self, pts, *, eval_features: bool = False,
                 deterministic: bool = True):
        g = group_points(pts, self.num_group, self.group_size)
        B = pts.shape[0]

        if eval_features:
            # linear-SVM probe features (Point_MAE_cp.py:342-348,425-429)
            tokens = self.encoder(g.neighborhood, use_running_average=True)
            x = self.blocks(tokens, self.pos_embed(g.center), path="none",
                            deterministic=True)
            return jnp.max(self.norm(x), axis=1)

        vis_idx, mask_idx = self._rand_mask_idx(B)
        vis_center = jnp.take_along_axis(g.center, vis_idx[..., None], axis=1)
        mask_center = jnp.take_along_axis(g.center, mask_idx[..., None], axis=1)
        mask_neigh = jnp.take_along_axis(
            g.neighborhood, mask_idx[..., None, None], axis=1)

        # encode ALL groups through both BatchNorms, then gather the visible
        # groups INSIDE the encoder (right after the second BN): the reference
        # runs the encoder before the mask select (Point_MAE_cp.py:352-357),
        # so in train mode the encoder's BN statistics couple the masked
        # groups too — but past the second BN the masked activations feed
        # nothing, so the final conv+pool skips them (gradient-exact, saves
        # ~24% of the encoder FLOPs at mask_ratio 0.6).
        tokens = self.encoder(g.neighborhood,
                              use_running_average=deterministic,
                              vis_idx=vis_idx)
        x_vis = self.blocks(tokens, self.pos_embed(vis_center), path="none",
                            deterministic=deterministic)
        x_vis = self.norm(x_vis)

        pos_vis = self.decoder_pos_embed(vis_center)
        pos_mask = self.decoder_pos_embed(mask_center)
        N = mask_idx.shape[1]
        mask_token = jnp.broadcast_to(self.mask_token, (B, N, self.trans_dim))
        x_full = jnp.concatenate([x_vis, mask_token], axis=1)
        pos_full = jnp.concatenate([pos_vis, pos_mask], axis=1)
        x_rec = self.MAE_decoder(x_full, pos_full, N, deterministic=deterministic)

        rebuild = self.increase_dim(x_rec).reshape(B * N, self.group_size, 3)
        gt = mask_neigh.reshape(B * N, self.group_size, 3)
        loss_fn = chamfer_l1 if self.loss_type == "cdl1" else chamfer_l2
        return loss_fn(rebuild, gt)


@MODELS.register_module("PointTransformer")
class PointTransformer(nn.Module):
    """Plain 12-block ViT classifier for full fine-tuning
    (``Point_MAE_cp.py:468-596``)."""
    config: Any

    def setup(self):
        cfg = to_config(self.config)
        self.trans_dim = cfg.trans_dim
        self.encoder = Encoder(cfg.encoder_dims)
        self.pos_embed = PosEmbedMLP(cfg.trans_dim)
        self.blocks = ScannedEncoderStack(
            embed_dim=cfg.trans_dim, depth=cfg.depth, num_heads=cfg.num_heads,
            drop_path_rate=cfg.drop_path_rate, plain=True,
            unroll=cfg.get("scan_unroll", None))
        self.norm = nn.LayerNorm()
        self.cls_token = self.param("cls_token", trunc_normal_init,
                                    (1, 1, cfg.trans_dim))
        self.cls_pos = self.param("cls_pos", trunc_normal_init,
                                  (1, 1, cfg.trans_dim))
        from .unify import ClsHead
        self.cls_head_finetune = ClsHead(cfg.cls_dim)
        self.num_group = cfg.num_group
        self.group_size = cfg.group_size

    def __call__(self, pts, *, deterministic: bool = True, **_ignored):
        g = group_points(pts, self.num_group, self.group_size)
        tokens = self.encoder(g.neighborhood, use_running_average=deterministic)
        B = tokens.shape[0]
        cls_tok = jnp.broadcast_to(self.cls_token, (B, 1, self.trans_dim))
        cls_pos = jnp.broadcast_to(self.cls_pos, (B, 1, self.trans_dim))
        x = jnp.concatenate([cls_tok, tokens], axis=1)
        pos = jnp.concatenate([cls_pos, self.pos_embed(g.center)], axis=1)
        x = self.blocks(x, pos, path="none", deterministic=deterministic)
        x = self.norm(x)
        concat_f = jnp.concatenate([x[:, 0], jnp.max(x[:, 1:], axis=1)], axis=-1)
        return self.cls_head_finetune(concat_f, deterministic=deterministic)
