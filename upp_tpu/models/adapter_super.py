"""Elastic-width bottleneck adapters (reference ``models/adapter_super.py`` —
legacy, not imported by the unify models but part of the model-component
inventory). ``AdapterSuper`` supports sampling a sub-width of the bottleneck
at call time (supernet-style elastic dimension); ``AdapterSuperF`` is the
variant with a fixed output scale."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .layers import kaiming_uniform_a5


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class AdapterSuper(nn.Module):
    embed_dims: int
    reduction_dims: int
    drop_rate_adapter: float = 0.1

    @nn.compact
    def __call__(self, x, identity=None, sample_embed_dim: Optional[int] = None,
                 deterministic: bool = True):
        """sample_embed_dim (static) selects the first k bottleneck channels —
        the elastic-dim sampling of the reference's set_sample_config."""
        if identity is None:
            identity = x
        k = sample_embed_dim or self.reduction_dims
        w1 = self.param("ln1_kernel", kaiming_uniform_a5,
                        (self.embed_dims, self.reduction_dims))
        b1 = self.param("ln1_bias", nn.initializers.normal(1e-6),
                        (self.reduction_dims,))
        w2 = self.param("ln2_kernel", kaiming_uniform_a5,
                        (self.reduction_dims, self.embed_dims))
        b2 = self.param("ln2_bias", nn.initializers.normal(1e-6),
                        (self.embed_dims,))
        h = x @ w1[:, :k] + b1[:k]
        h = quick_gelu(h)
        h = nn.Dropout(self.drop_rate_adapter)(h, deterministic=deterministic)
        out = h @ w2[:k, :] + b2
        return identity + out


class AdapterSuperF(nn.Module):
    """AdapterSuper_f: LayerNorm front-end + fixed 0.7 scale, no residual."""
    embed_dims: int
    reduction_dims: int
    drop_rate_adapter: float = 0.1
    scale: float = 0.7

    @nn.compact
    def __call__(self, x, sample_embed_dim: Optional[int] = None,
                 deterministic: bool = True):
        x = nn.LayerNorm(name="layer_norm")(x)
        k = sample_embed_dim or self.reduction_dims
        w1 = self.param("ln1_kernel", kaiming_uniform_a5,
                        (self.embed_dims, self.reduction_dims))
        b1 = self.param("ln1_bias", nn.initializers.normal(1e-6),
                        (self.reduction_dims,))
        w2 = self.param("ln2_kernel", kaiming_uniform_a5,
                        (self.reduction_dims, self.embed_dims))
        b2 = self.param("ln2_bias", nn.initializers.normal(1e-6),
                        (self.embed_dims,))
        h = x @ w1[:, :k] + b1[:k]
        h = quick_gelu(h)
        h = nn.Dropout(self.drop_rate_adapter)(h, deterministic=deterministic)
        return (h @ w2[:k, :] + b2) * self.scale
