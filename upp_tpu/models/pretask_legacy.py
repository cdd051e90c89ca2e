"""Legacy prompter-pretraining model ``Point_MAE_pretask`` (reference
``models/Point_MAE_pretask.py:444-698`` — predecessor of Point_MAE_pretask_dev,
kept for inventory/config parity).

Differences from the dev model (SURVEY.md M13):
* tokens come from grouping the FULL cloud, then FPS-subsampling the centers
  and residually re-diffusing all-token features onto the visible subset
  (``propagate`` with k=8) instead of re-grouping the visible points;
* the rectification head is named ``mask_prompter`` (same architecture);
* the rectify branch runs 2 plain blocks (no prompts/adapters);
* the noise loss adds a binary-overlap (BCE-between-one-hots) term:
  0.6*positive + negative + 0.02*bce. The reference evaluates
  ``nn.BCELoss()(gt_onehot, pred_onehot)`` on two exactly-binary vectors,
  which with torch's log-clamp(-100) equals 100 x mismatch-rate; we compute
  that value directly instead of replicating the clamped-log hack.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.fps import fps
from ..ops.group import group_points
from ..ops.knn import knn_points
from ..ops.propagate import propagate
from .blocks import PrompterConfig
from .build import MODELS
from ..utils.config import to_config
from .prompter import RectifyPrompter
from .unify import _UnifyCore


@MODELS.register_module("Point_MAE_pretask")
class PointMAEPretaskLegacy(nn.Module):
    config: Any

    def setup(self):
        cfg = to_config(self.config)
        tc = cfg.transformer_config
        self.core = _UnifyCore(
            trans_dim=tc.trans_dim, depth=tc.depth, num_heads=tc.num_heads,
            encoder_dims=tc.encoder_dims, drop_path_rate=tc.drop_path_rate,
            decoder_depth=tc.decoder_depth, decoder_num_heads=tc.decoder_num_heads,
            group_size=cfg.group_size, num_group=cfg.num_group,
            mask_ratio=tc.mask_ratio,
            prompter=PrompterConfig.from_cfg(cfg.get("prompter_config")),
            remat=bool(cfg.get("remat_blocks", False)),
            unroll=cfg.get("scan_unroll", 4))
        self.mask_prompter = RectifyPrompter(
            hidden_dimension=tc.trans_dim)

    def _tokenize(self, pts, deterministic):
        """Full grouping → FPS-subsample centers → re-diffuse token features
        (``Point_MAE_pretask.py:617-623``)."""
        core = self.core
        g = group_points(pts, core.num_group, core.group_size)
        tokens = core.encoder(g.neighborhood, use_running_average=deterministic)
        vis_center, vis_idx = fps(g.center, core.vis_num)
        vis_tokens = jnp.take_along_axis(tokens, vis_idx[..., None], axis=1)
        vis_tokens = propagate(vis_center, g.center, vis_tokens, tokens,
                               de_neighbors=8)
        return vis_center, vis_tokens

    def __call__(self, pts, *, point_num: int = 1024,
                 train_with_gaussian: bool = True, deterministic: bool = True):
        core = self.core
        B, P, _ = pts.shape
        vis_center, vis_tokens = self._tokenize(pts, deterministic)

        aux = None
        if train_with_gaussian and not deterministic:
            pos = core.pos_embed(vis_center)
            # 2 plain blocks (Point_MAE_pretask.py:626: blocks(..., depth=2))
            h = core.blocks(vis_tokens, pos, path="rectify",
                            deterministic=deterministic)
            pred_vector = self.mask_prompter(pts, vis_center, h,
                                             deterministic=deterministic)
            gaussian_noise = pts[:, point_num:]
            partial_pts = pts[:, :point_num]
            _, _, clean_nn = knn_points(gaussian_noise, partial_pts, 4)
            noise_vector = jnp.mean(clean_nn - gaussian_noise[:, :, None, :], -2)
            positive = jnp.mean(jnp.sum(
                (pred_vector[:, point_num:] - noise_vector) ** 2, -1))
            negative = jnp.mean(jnp.sum(pred_vector[:, :point_num] ** 2, -1))

            score = jnp.linalg.norm(pred_vector, axis=-1)
            order = jnp.argsort(-score, axis=1)
            n_drop = P - point_num
            recall = jnp.mean(jnp.sum(
                (order[:, :n_drop] >= point_num).astype(jnp.float32), -1) / n_drop)
            # binary-overlap term == 100 x mismatch-rate (see module docstring)
            bce = 100.0 * 2.0 * n_drop * (1.0 - recall) / P
            noise_loss = 0.6 * positive + negative + 0.02 * bce

            keep_idx = order[:, n_drop:]
            pts = jax.lax.stop_gradient(
                jnp.take_along_axis(pts, keep_idx[..., None], axis=1))
            vis_center, vis_tokens = self._tokenize(pts, deterministic)
            aux = (noise_loss, recall)

        # completion branch shared with the dev model, fed the diffused tokens
        pos = core.pos_embed(vis_center)
        x_vis = core.blocks(vis_tokens, pos, path="pretask",
                            deterministic=deterministic)
        x_vis = core.norm(x_vis)
        pos_emd_vis = core.decoder_pos_embed(vis_center)
        shape_feature = core.shape_pred(x_vis).reshape(B, core.vis_short * core.vis_num)
        predict_center = core.coarse_pred(shape_feature).reshape(
            B, core.num_group - core.vis_num, 3)
        predict_token = core.predict_token_generator(x_vis)
        pos_emd_mask = core.decoder_pos_embed(predict_center)
        n_mask = predict_center.shape[1]
        mask_token = jnp.broadcast_to(core.mask_token, (B, n_mask, core.trans_dim))
        mask_token = propagate(predict_center, vis_center, mask_token,
                               predict_token, de_neighbors=6)
        x_full = jnp.concatenate([x_vis, mask_token], axis=1)
        pos_full = jnp.concatenate([pos_emd_vis, pos_emd_mask], axis=1)
        x_rec = core.MAE_decoder(x_full, pos_full, n_mask,
                                 deterministic=deterministic)
        rel = core.dense_pred(x_rec).reshape(B, n_mask, core.group_size, 3)
        rebuild = (rel + predict_center[:, :, None, :]).reshape(B, -1, 3)

        if aux is not None:
            return predict_center, rebuild, aux[0], aux[1]
        return predict_center, rebuild
