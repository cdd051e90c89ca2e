"""Part-segmentation models: Point_MAE_unify_seg (UPP/PEFT) and
PointTransformer_seg (full fine-tune).

Re-implements ``models/Point_MAE_unify_segment.py:328-625`` and
``models/Point_MAE_segment.py:275-456``: rectify + completion front-end (UPP
variant only), downstream pass tapping features after blocks {3, 7, 11},
global max+avg pooling, 16-class one-hot label embedding, inverse-distance
propagation of group features to the full-resolution query points, and a
pointwise seg head emitting log-probabilities over 50 part classes.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.fps import fps
from ..ops.group import group_points
from .blocks import PrompterConfig
from .scan_blocks import ScannedEncoderStack
from .build import MODELS
from ..utils.config import to_config
from .layers import TorchBatchNorm, Encoder, PosEmbedMLP
from .prompter import PointNetFeaturePropagation
from .unify import _UnifyCore


class LabelConv(nn.Module):
    """16-class one-hot → 128-d label embedding
    (``Point_MAE_unify_segment.py:414-420``)."""

    @nn.compact
    def __call__(self, one_hot, deterministic: bool = True):
        x = nn.Dense(64, name="conv0")(one_hot)                 # [B, 64]
        x = TorchBatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-5, name="bn0")(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Dense(128, name="conv1")(x)
        x = TorchBatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-5, name="bn1")(x)
        return nn.leaky_relu(x, 0.2)                            # [B, 128]


class _SplitDense(nn.Module):
    """Dense over the concat [per-point ‖ per-cloud] features WITHOUT
    materialising the concat: the reference repeats its global feature over
    all N points before the first seg-head conv
    (``Point_MAE_unify_segment.py:597-613``), a [B, N, 2432] tensor that is
    CONSTANT along N — ~600 MB of redundant HBM traffic per fwd at the
    shipped shapes. Splitting the kernel rows gives
    ``x @ W = f0 @ W[:1024] + glob @ W[1024:]`` with the global term computed
    once per cloud and broadcast. Parameter names/shapes are identical to the
    fused Dense (kernel [in_pp+in_glob, out], bias [out]) so torch
    checkpoints load unchanged."""
    features: int
    in_pp: int          # per-point channel count (f0)

    @nn.compact
    def __call__(self, f0, glob_row):
        in_glob = glob_row.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_pp + in_glob, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        per_point = f0 @ kernel[:self.in_pp]                    # [B, N, out]
        per_cloud = glob_row @ kernel[self.in_pp:] + bias       # [B, out]
        return per_point + per_cloud[:, None, :]


class SegHead(nn.Module):
    """Pointwise seg head (``Point_MAE_unify_segment.py:424-433``). Takes the
    per-point features and the per-cloud global row separately (see
    ``_SplitDense``)."""
    cls_dim: int
    in_pp: int = 1024

    @nn.compact
    def __call__(self, f0, glob_row, deterministic: bool = True):
        x = _SplitDense(512, self.in_pp, name="conv0")(f0, glob_row)
        x = TorchBatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-5, name="bn0")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5)(x, deterministic=deterministic)
        x = nn.Dense(256, name="conv1")(x)
        x = TorchBatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-5, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.cls_dim, name="conv2")(x)
        return jax.nn.log_softmax(x, axis=-1)                   # [B, N, cls]


def _seg_features(x_taps, label_emb):
    """Concat taps → global max/avg + label embedding row [B, 2432]
    (``Point_MAE_unify_segment.py:596-606``; broadcast over N happens inside
    ``_SplitDense``)."""
    x = jnp.concatenate(x_taps, axis=-1)                        # [B, G, 1152]
    x_max = jnp.max(x, axis=1)
    x_avg = jnp.mean(x, axis=1)
    glob = jnp.concatenate([x_max, x_avg, label_emb], axis=-1)  # [B, 2432]
    return x, glob


@MODELS.register_module("Point_MAE_unify_seg")
class PointMAEUnifySeg(nn.Module):
    """UPP segmentation model (``Point_MAE_unify_segment.py:328-625``)."""
    config: Any

    def setup(self):
        cfg = to_config(self.config)
        tc = cfg.transformer_config
        # NOTE: the seg front-end keeps 64-group completion geometry even when
        # num_group=128 downstream (vis_num is hardcoded 64-based at
        # ``Point_MAE_unify_segment.py:343``).
        self.core = _UnifyCore(
            trans_dim=tc.trans_dim, depth=tc.depth, num_heads=tc.num_heads,
            encoder_dims=tc.encoder_dims, drop_path_rate=tc.drop_path_rate,
            decoder_depth=tc.decoder_depth, decoder_num_heads=tc.decoder_num_heads,
            group_size=cfg.group_size, num_group=64, mask_ratio=tc.mask_ratio,
            prompter=PrompterConfig.from_cfg(cfg.prompter_config),
            if_half=bool(cfg.get("if_half", False)),
            remat=bool(cfg.get("remat_blocks", False)),
            unroll=cfg.get("scan_unroll", None))
        self.num_group = cfg.num_group
        self.group_size = cfg.group_size
        self.label_conv = LabelConv()
        self.propagation_0 = PointNetFeaturePropagation(
            mlp=(384 * 4, 1024), interpolate_neighbors=3)
        self.seg_head = SegHead(cfg.cls_dim)
        self.prompt_propagation_after = bool(cfg.get("prompt_propagation_after", False))

    def __call__(self, pts, cls_label, label_points=None, *,
                 completion_prompt: bool = True, denoise: bool = True,
                 point_num: int = 1024, deterministic: bool = True):
        """Args follow ``Point_MAE_unify_segment.py:475``; ``cls_label`` is the
        [B, 16] one-hot object class; ``label_points`` the full-resolution
        query points carrying per-point part labels."""
        core = self.core
        query = label_points if label_points is not None else pts
        B, N, _ = query.shape

        if denoise:
            pts = core.denoise_pts(pts, point_num, deterministic)
        if completion_prompt:
            _, rebuild = core.complete(pts, deterministic)
            sample_rebuild, _ = fps(rebuild, point_num // 4)
            pts = jnp.concatenate([pts, sample_rebuild], axis=1)
            if pts.shape[1] > point_num:
                pts, _ = fps(pts, point_num)

        g = group_points(pts, self.num_group, self.group_size)
        tokens = core.encoder(g.neighborhood, use_running_average=deterministic)
        pos = core.pos_embed(g.center)

        propagation = None
        if self.prompt_propagation_after:
            cfg = to_config(self.config)
            lvl2 = group_points(g.center, self.num_group // 2, 8)
            propagation = {"center1": g.center, "center1_idx": lvl2.idx,
                           "center2": lvl2.center, "center2_idx": lvl2.center_idx,
                           # the shipped seg config uses gather_idx=True (the
                           # reference's within-sample but prompt-offset path)
                           "gather_idx": bool(cfg.get("gather_idx", True)),
                           "quirk": cfg.get("propagation_semantics",
                                            "reference") != "clean"}

        # one shared block stack for all passes (as in the reference); the
        # downstream pass taps features after blocks {3, 7, 11}
        x, taps = core.blocks(tokens, pos, path="downstream",
                              propagation=propagation,
                              deterministic=deterministic,
                              feature_blocks=(3, 7, 11))
        label_emb = self.label_conv(cls_label, deterministic=deterministic)
        x, glob = _seg_features(taps, label_emb)
        f0 = self.propagation_0(query, g.center, query, x,
                                use_running_average=deterministic)  # [B,N,1024]
        return self.seg_head(f0, glob, deterministic=deterministic)


@MODELS.register_module("PointTransformer_seg")
class PointTransformerSeg(nn.Module):
    """Full fine-tune segmentation baseline
    (``Point_MAE_segment.py:275-456``): same downstream head without the
    prompt paths (propagation_0 uses 5 interpolation neighbours there)."""
    config: Any

    def setup(self):
        cfg = to_config(self.config)
        self.encoder = Encoder(cfg.encoder_dims)
        self.pos_embed = PosEmbedMLP(cfg.trans_dim)
        self.blocks = ScannedEncoderStack(
            embed_dim=cfg.trans_dim, depth=cfg.depth, num_heads=cfg.num_heads,
            drop_path_rate=cfg.drop_path_rate,
            unroll=cfg.get("scan_unroll", None))
        self.label_conv = LabelConv()
        self.propagation_0 = PointNetFeaturePropagation(
            mlp=(384 * 4, 1024), interpolate_neighbors=5)
        self.seg_head = SegHead(cfg.cls_dim)
        self.num_group = cfg.num_group
        self.group_size = cfg.group_size

    def __call__(self, pts, cls_label, label_points=None, *,
                 deterministic: bool = True, **_ignored):
        query = label_points if label_points is not None else pts
        B, N, _ = query.shape
        g = group_points(pts, self.num_group, self.group_size)
        tokens = self.encoder(g.neighborhood, use_running_average=deterministic)
        _, taps = self.blocks(tokens, self.pos_embed(g.center), path="none",
                              deterministic=deterministic,
                              feature_blocks=(3, 7, 11))
        label_emb = self.label_conv(cls_label, deterministic=deterministic)
        x, glob = _seg_features(taps, label_emb)
        f0 = self.propagation_0(query, g.center, query, x,
                                use_running_average=deterministic)
        return self.seg_head(f0, glob, deterministic=deterministic)
