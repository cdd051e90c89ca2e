"""Rectification Prompter — per-point noise-rectification vector field.

Re-implements ``RectifyPrompter`` and its PointNet++-style helpers
(``models/Point_MAE_pretask_dev.py:386-517``): a set-abstraction downsample of
the backbone's level-1 token features to 32 "level-2" centers (giving a global
shape feature), two inverse-distance feature propagations back to full
resolution, a NeRF positional embedding skip of the raw xyz, and a small score
head emitting a 3-D rectification vector per point. The vector's norm is the
noise score used for top-5% outlier dropping.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.group import group_points
from ..ops.geometry import index_points
from ..ops.propagate import inverse_distance_interp
from .layers import TorchBatchNorm, kaiming_uniform_a5, positional_embedding


class PointNetSetAbstraction(nn.Module):
    """Group + shared MLP + max-pool downsample
    (``Point_MAE_pretask_dev.py:386-423``). The pointwise Conv2d(k=1) stack is
    Dense over channels; BatchNorm stats span (batch, groups, neighbours)."""
    num_group: int
    group_size: int
    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz, feats, use_running_average: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        g = group_points(xyz.astype(jnp.float32), self.num_group, self.group_size)
        new_points = index_points(feats, g.idx)      # [B, G, S, D]
        x = new_points
        for li, out_ch in enumerate(self.mlp):
            x = nn.Dense(out_ch, name=f"conv{li}")(x)
            B, G, S, C = x.shape
            x = TorchBatchNorm(use_running_average=use_running_average,
                             momentum=0.9, epsilon=1e-5,
                             name=f"bn{li}")(x.reshape(B, G * S, C)).reshape(B, G, S, C)
            x = nn.relu(x)
        x = jnp.max(x, axis=2)                        # [B, G, mlp[-1]]
        return g.center, x


class PointNetFeaturePropagation(nn.Module):
    """Inverse-distance upsample + pointwise Conv1d/BN/ReLU stack
    (``Point_MAE_pretask_dev.py:425-473``)."""
    mlp: Sequence[int]
    interpolate_neighbors: int = 16

    @nn.compact
    def __call__(self, xyz1, xyz2, points1: Optional[jnp.ndarray], points2,
                 use_running_average: bool = True) -> jnp.ndarray:
        interpolated = inverse_distance_interp(
            xyz1, xyz2, points2, k=self.interpolate_neighbors, eps=1e-4)
        x = (interpolated if points1 is None
             else jnp.concatenate([points1, interpolated], axis=-1))
        for li, out_ch in enumerate(self.mlp):
            x = nn.Dense(out_ch, name=f"conv{li}")(x)
            x = TorchBatchNorm(use_running_average=use_running_average,
                             momentum=0.9, epsilon=1e-5, name=f"bn{li}")(x)
            x = nn.relu(x)
        return x


class RectifyPrompter(nn.Module):
    """Per-point rectification vector head (``Point_MAE_pretask_dev.py:475-517``).

    forward(x [B,N,3], center1 [B,G,3], center1_feature [B,G,D]):
      abstraction(center1, feats)          → center2 [B,32,3], feats2 [B,32,12]
      shape_feature = feats2 flattened     → [B, 32*12]
      propagation2(center1 ← center2)      → [B, G, 32]
      propagation1(x ← center1, skip=NeRF(x)) → [B, N, 32]
      score head 32 → 64 → relu → dropout → 3
    """
    in_channels: int = 3
    out_channels: int = 3
    hidden_dimension: int = 384
    embedding_level: int = 4
    num_group: int = 32
    group_size: int = 16
    top_center_dim: int = 12

    @nn.compact
    def __call__(self, x, center1, center1_feature, *,
                 require_shape_feature: bool = False,
                 deterministic: bool = True):
        ura = deterministic
        center2, center2_feature = PointNetSetAbstraction(
            self.num_group, self.group_size,
            mlp=(64, 32, self.top_center_dim), name="abstraction")(
            center1, center1_feature, use_running_average=ura)
        B = x.shape[0]
        shape_feature = center2_feature.reshape(B, -1)

        c1_feat = PointNetFeaturePropagation(
            mlp=(64, 32), name="propagation2")(
            center1, center2, None, center2_feature, use_running_average=ura)
        skip = positional_embedding(x, self.embedding_level)
        feat = PointNetFeaturePropagation(
            mlp=(32, 32), name="propagation1")(
            x, center1, skip, c1_feat, use_running_average=ura)

        h = nn.Dense(64, kernel_init=kaiming_uniform_a5,
                     bias_init=nn.initializers.zeros, name="score0")(feat)
        h = nn.relu(h)
        h = nn.Dropout(0.2)(h, deterministic=deterministic)
        score = nn.Dense(self.out_channels, kernel_init=kaiming_uniform_a5,
                         bias_init=nn.initializers.zeros, name="score1")(h)
        if require_shape_feature:
            return score, shape_feature
        return score
