"""Shared neural building blocks (flax.linen).

Mirrors the reference layer zoo in ``models/Point_MAE_unify.py`` /
``models/Point_MAE_pretask_dev.py``: Mlp, Attention, Adapter, the mini-PointNet
``Encoder`` tokenizer, NeRF positional embedding, and DropPath. Parameter
initialisers follow the reference (timm trunc_normal(.02) for linear layers in
the ViT trunk, kaiming_uniform(a=sqrt(5)) for adapter/head layers).

TPU notes: all "Conv1d(k=1)" stacks in the reference are pointwise and are
expressed as Dense layers over a [..., points, channels] layout so XLA lowers
them to batched MXU matmuls; max-pools are axis reductions on the VPU.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# timm-style trunc_normal(std=.02) used across the reference ViT trunk
trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


def kaiming_uniform_a5(key, shape, dtype=jnp.float32):
    """torch.nn.init.kaiming_uniform_(a=sqrt(5)) on a [in, out] Dense kernel —
    torch's default Linear init (and the reference's explicit adapter/head
    init, ``Point_MAE_unify.py:151,489``). bound = sqrt(6/((1+a^2)*fan_in)) =
    1/sqrt(fan_in)."""
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(key, shape, dtype=jnp.float32, fan_in: int = 1):
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch-exact running-statistics semantics.

    flax's ``nn.BatchNorm`` folds the BIASED batch variance into the running
    average; torch BatchNorm1d/2d uses the UNBIASED estimate (factor
    n/(n-1)). The per-step difference is ~var/n but it compounds into
    measurable eval drift over a training run — the long-horizon
    training-equivalence test (tests/test_train_horizon.py) only tracks the
    reference with this module. Variable names mirror ``nn.BatchNorm``
    (params: scale/bias; batch_stats: mean/var) so checkpoints and the torch
    ckpt shim are unaffected. Normalisation itself uses the biased variance,
    like both frameworks.
    """
    use_running_average: bool = True
    momentum: float = 0.9        # flax convention: decay of the OLD average
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            red = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=red)
            # one-pass E[x²]−E[x]² (flax BatchNorm's form): jnp.var is
            # two-pass and costs a second HBM read of the activations
            var = jnp.maximum(jnp.mean(xf * xf, axis=red) - mean * mean, 0.0)
            n = 1
            for d in red:
                n *= x.shape[d]
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var
                                * (n / max(n - 1, 1)))
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath)."""
    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, mask_shape)
        return jnp.where(mask, x / keep, 0.0)


class Mlp(nn.Module):
    """Transformer MLP (``Point_MAE_unify.py:226-242``)."""
    hidden_features: int
    out_features: int
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_features, kernel_init=trunc_normal_init, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.out_features, kernel_init=trunc_normal_init, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class Attention(nn.Module):
    """Multi-head self-attention (``Point_MAE_unify.py:245-269``).

    Sequence lengths here are tiny (≤ ~140 tokens), so one fused softmax
    attention per block is the right shape for TPU — no windowing needed.
    """
    dim: int
    num_heads: int
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, N, C = x.shape
        H = self.num_heads
        head_dim = C // H
        scale = self.qk_scale or head_dim ** -0.5

        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias,
                       kernel_init=trunc_normal_init, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]                      # [B, H, N, hd]

        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        out = nn.Dense(C, kernel_init=trunc_normal_init, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class Adapter(nn.Module):
    """Bottleneck adapter with fixed 0.7 output scale
    (``Point_MAE_pretask_dev.py:54-104``)."""
    embed_dims: int
    reduction_dims: int = 32
    drop_rate: float = 0.1
    scale: float = 0.7

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.LayerNorm(name="layer_norm")(x)
        out = nn.Dense(self.reduction_dims, kernel_init=kaiming_uniform_a5,
                       bias_init=nn.initializers.normal(1e-6), name="ln1")(x)
        out = nn.gelu(out, approximate=False)
        out = nn.Dropout(self.drop_rate)(out, deterministic=deterministic)
        out = nn.Dense(self.embed_dims, kernel_init=kaiming_uniform_a5,
                       bias_init=nn.initializers.normal(1e-6), name="ln2")(out)
        return out * self.scale


class Encoder(nn.Module):
    """Mini-PointNet group tokenizer (``Point_MAE_unify.py:191-222``).

    Input [B, G, n, 3] center-relative neighbourhoods → tokens [B, G, C].
    Pointwise convs are Dense over the channel axis; BatchNorm statistics are
    taken over (batch*groups*points), matching torch BatchNorm1d on the
    flattened (B*G, C, n) layout.

    ``compute_dtype=bfloat16`` runs the conv matmuls on the MXU in bf16
    (params and BN statistics stay f32) — the `if_half` knob of the
    reference. ``vis_idx`` (MAE pretraining) gathers the visible groups
    right after the second BatchNorm: the masked groups' activations feed
    ONLY the BN batch statistics (``Point_MAE_cp.py:352-357`` encodes all
    groups before the mask select), so the final 512→C conv + maxpool on
    the ~60% masked groups is pure waste — skipping it is gradient-exact.
    """
    encoder_channel: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, point_groups, use_running_average: bool = True,
                 vis_idx=None):
        bs, g, n, _ = point_groups.shape
        # pointwise chains run on a FLAT [BG*n, C] layout: plain 2-D matmuls.
        # (A 3-D [960, 16, C] dot_general trips a TPU-backend conv-emitter
        # cost-model CHECK at exactly the seg model's vis-grouping shape —
        # jellyfish fusion_util TransformWindow abort; 2-D dots never take
        # that path. BN statistics are unchanged: reduce over all-but-last.)
        cd = self.compute_dtype
        x = point_groups.reshape(bs * g * n, 3)
        # first_conv: 3 → 128 → BN → ReLU → 256
        x = nn.Dense(128, dtype=cd, name="first_conv0")(x)
        # cast BN outputs back to the compute dtype: BN statistics stay f32
        # inside TorchBatchNorm; writing the normalised activations at f32
        # doubles the HBM traffic of the whole elementwise chain for nothing
        x = TorchBatchNorm(use_running_average=use_running_average,
                         momentum=0.9, epsilon=1e-5, name="first_bn")(x).astype(cd)
        x = nn.relu(x)
        x = nn.Dense(256, dtype=cd, name="first_conv1")(x)
        x = x.reshape(bs * g, n, 256)
        g_max = jnp.max(x, axis=1, keepdims=True)                 # [BG, 1, 256]
        x = jnp.concatenate([jnp.broadcast_to(g_max, x.shape), x], axis=-1)
        # second_conv: 512 → 512 → BN → ReLU → C
        x = x.reshape(bs * g * n, 512)
        x = nn.Dense(512, dtype=cd, name="second_conv0")(x)
        x = TorchBatchNorm(use_running_average=use_running_average,
                         momentum=0.9, epsilon=1e-5, name="second_bn")(x).astype(cd)
        if vis_idx is not None:
            x = jnp.take_along_axis(x.reshape(bs, g, n, 512),
                                    vis_idx[..., None, None], axis=1)
            g = vis_idx.shape[1]
            x = x.reshape(bs * g * n, 512)
        x = nn.relu(x)
        x = nn.Dense(self.encoder_channel, dtype=cd, name="second_conv1")(x)
        x = jnp.max(x.reshape(bs * g, n, self.encoder_channel), axis=1)
        return x.reshape(bs, g, self.encoder_channel).astype(jnp.float32)


class PosEmbedMLP(nn.Module):
    """3 → 128 → GELU → trans_dim positional embedding
    (``Point_MAE_unify.py:408-412``)."""
    out_dim: int
    hidden: int = 128

    @nn.compact
    def __call__(self, xyz):
        x = nn.Dense(self.hidden, kernel_init=trunc_normal_init, name="lin0")(xyz)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out_dim, kernel_init=trunc_normal_init, name="lin1")(x)


class TwoLayerHead(nn.Module):
    """Linear → GELU → Linear head pattern (shape_pred / coarse_pred /
    predict_token_generator, ``Point_MAE_unify.py:424-439``)."""
    hidden: int
    out_dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, kernel_init=trunc_normal_init, name="lin0")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out_dim, kernel_init=trunc_normal_init, name="lin1")(x)


def positional_embedding(x: jnp.ndarray, n_freqs: int) -> jnp.ndarray:
    """NeRF sin/cos embedding, x ‖ sin(2^k x) ‖ cos(2^k x)
    (``Point_MAE_unify.py:94-124``). Pure function — no parameters."""
    out = [x]
    for k in range(n_freqs):
        f = float(2 ** k)
        out.append(jnp.sin(f * x))
        out.append(jnp.cos(f * x))
    return jnp.concatenate(out, axis=-1)
