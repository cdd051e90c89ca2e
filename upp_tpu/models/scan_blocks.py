"""Scanned prompted-block stacks: stacked per-block parameters + lax.scan.

The reference executes 12 heterogeneously-prompted transformer blocks per pass
and three passes per step (rectify/pretask/downstream). Tracing 40 unrolled
block bodies produces an enormous HLO (multi-minute XLA compiles). Here every
per-block tensor is *stacked* ([L, ...]) and each pass runs as a ``lax.scan``
over a slice of the stack:

  rectify    → scan over blocks[0:3]   (prompts + adapters)
  pretask    → scan over blocks[0:6]   (prompts + adapters)
  downstream → scan over blocks[0:dp]  (prompts + adapters [+ propagation])
             → scan over blocks[dp:L]  (adapters only)
  decoder    → scan over 4 blocks      (pretask adapters)

All passes share ONE parameter stack (the frozen backbone), mirroring the
reference's single nn.ModuleList; slicing the stack replaces depth truncation.
Structure changes (prompt insertion / stripping) happen inside the scan body,
so the carry shape stays fixed.

Parameter names keep the reference's PEFT substrings (``downstream_adapter``,
``bnorm``, ``*_prompts``) so ``peft_detect`` freezing works unchanged, and the
torch checkpoint shim writes per-block tensors into stack rows.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.propagate import inverse_distance_interp
from .blocks import PrompterConfig

trunc02 = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)

def _effective_unroll(module_unroll: Optional[int], n: int) -> int:
    """Resolve the scan unroll factor: ``UPP_SCAN_UNROLL`` env (the sweep /
    kill-switch knob) overrides the module's configured value; unset or
    empty falls through to the config (None = full unroll). A set-but-non-
    integer value is a LOUD error (VERDICT r4 item 7: a typo like
    ``UPP_SCAN_UNROLL=full`` used to silently fall back to the default —
    in a knob whose whole purpose is controlled experiments)."""
    raw = os.environ.get("UPP_SCAN_UNROLL", "")
    if raw:
        try:
            return int(raw)
        except ValueError:
            raise ValueError(
                f"UPP_SCAN_UNROLL={raw!r} is not an integer; set an int "
                "(1 = rolled lax.scan, >=depth = full unroll) or unset it")
    return n if module_unroll is None else int(module_unroll)


BACKBONE_LEAVES = ("norm1_scale", "norm1_bias", "norm2_scale", "norm2_bias",
                   "attn_qkv_kernel", "attn_proj_kernel", "attn_proj_bias",
                   "mlp_fc1_kernel", "mlp_fc1_bias", "mlp_fc2_kernel",
                   "mlp_fc2_bias")


def _stacked_kaiming(key, shape, dtype=jnp.float32):
    """kaiming_uniform(a=sqrt(5)) with per-block fan (shape[1])."""
    bound = 1.0 / jnp.sqrt(shape[1])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _stacked_xavier(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[-2], shape[-1]
    bound = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _layer_norm(x, scale, bias, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _dropout(x, rate, rng, deterministic, salt=0):
    if rate == 0.0 or deterministic or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(jax.random.fold_in(rng, salt), keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def _drop_path(x, rate, rng, deterministic, salt=0):
    """Stochastic depth with a (possibly traced) per-block rate."""
    if deterministic or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(jax.random.fold_in(rng, 100 + salt), keep,
                                (x.shape[0],) + (1,) * (x.ndim - 1))
    return jnp.where(mask, x / keep, 0.0)


class ScannedEncoderStack(nn.Module):
    """Scan-based stack with the unrolled TransformerEncoderStack's call
    surface (used by unify / pretask / seg / baseline models)."""
    embed_dim: int
    depth: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    prompter: PrompterConfig = PrompterConfig()
    is_decoder: bool = False  # decoder variant: pretask adapters in ALL blocks
    # plain ViT stack (vanilla Point_MAE / PointTransformer,
    # Point_MAE_cp.py:166-237): no prompts, no adapters, no propagation
    # pooling BN — their reference blocks have none of those params, and
    # creating them would break torch-checkpoint round-trips (orphan leaves).
    plain: bool = False
    # bf16 matmuls with f32 accumulation (the reference's `if_half` knob);
    # LayerNorm/softmax/residual math stays f32.
    compute_dtype: Any = jnp.float32
    # rematerialize each block in the backward pass (saves only the carry
    # per scan iteration instead of every intermediate). Helped in round 2
    # (64.0 -> 61.3 ms/step) but HURTS after the flat-2D encoder + one-pass
    # BN reworks (54.9 remat vs 53.1 residual-saving on v5e, bs 120), so the
    # callers now default it OFF — cfg knob `remat_blocks: True` re-enables
    # it for memory-constrained (larger-batch) runs.
    remat: bool = False
    # scan unroll factor (cfg `scan_unroll`); None = full unroll (fastest
    # step — every iteration is latency-bound at these token counts) at the
    # cost of a larger HLO / longer cold compile. `UPP_SCAN_UNROLL` env
    # still overrides both (kill switch + sweep knob). Compile-vs-step
    # numbers: BASELINE.md "Compile-time budget".
    unroll: Optional[int] = None

    def setup(self):
        L, C = self.depth, self.embed_dim
        hidden = int(C * self.mlp_ratio)
        p = self.prompter
        ones, zeros = nn.initializers.ones, nn.initializers.zeros
        self.norm1_scale = self.param("norm1_scale", ones, (L, C))
        self.norm1_bias = self.param("norm1_bias", zeros, (L, C))
        self.norm2_scale = self.param("norm2_scale", ones, (L, C))
        self.norm2_bias = self.param("norm2_bias", zeros, (L, C))
        self.attn_qkv_kernel = self.param("attn_qkv_kernel", trunc02, (L, C, 3 * C))
        self.attn_proj_kernel = self.param("attn_proj_kernel", trunc02, (L, C, C))
        self.attn_proj_bias = self.param("attn_proj_bias", zeros, (L, C))
        self.mlp_fc1_kernel = self.param("mlp_fc1_kernel", trunc02, (L, C, hidden))
        self.mlp_fc1_bias = self.param("mlp_fc1_bias", zeros, (L, hidden))
        self.mlp_fc2_kernel = self.param("mlp_fc2_kernel", trunc02, (L, hidden, C))
        self.mlp_fc2_bias = self.param("mlp_fc2_bias", zeros, (L, C))
        if not self.plain:
            # pooling BatchNorm, one per block (PEFT recipe trains 'bnorm')
            self.bnorm_scale = self.param("bnorm_scale", ones, (L, C))
            self.bnorm_bias = self.param("bnorm_bias", zeros, (L, C))
            self.bnorm_mean = self.variable("batch_stats", "bnorm_mean",
                                            lambda: jnp.zeros((L, C)))
            self.bnorm_var = self.variable("batch_stats", "bnorm_var",
                                           lambda: jnp.ones((L, C)))

        def make_adapter(prefix, La):
            return {
                "layer_norm_scale": self.param(f"{prefix}_layer_norm_scale",
                                               ones, (La, C)),
                "layer_norm_bias": self.param(f"{prefix}_layer_norm_bias",
                                              zeros, (La, C)),
                "ln1_kernel": self.param(f"{prefix}_ln1_kernel",
                                         _stacked_kaiming, (La, C, 32)),
                "ln1_bias": self.param(f"{prefix}_ln1_bias",
                                       nn.initializers.normal(1e-6), (La, 32)),
                "ln2_kernel": self.param(f"{prefix}_ln2_kernel",
                                         _stacked_kaiming, (La, 32, C)),
                "ln2_bias": self.param(f"{prefix}_ln2_bias",
                                       nn.initializers.normal(1e-6), (La, C)),
            }

        adapters: Dict[str, Dict[str, jnp.ndarray]] = {}
        prompts: Dict[str, jnp.ndarray] = {}
        if self.plain:
            pass
        elif self.is_decoder:
            adapters["pretask"] = make_adapter("pretask_adapter", L)
        else:
            if p.rectify_adapter and p.rectify_depth:
                adapters["rectify"] = make_adapter("rectify_adapter", p.rectify_depth)
            if p.pretask_adapter and p.pretask_depth:
                adapters["pretask"] = make_adapter("pretask_adapter", p.pretask_depth)
            if p.downstream_adapter:
                adapters["downstream"] = make_adapter("downstream_adapter", L)
            if p.rectify_prompts and p.rectify_prompts_depth:
                prompts["rectify"] = self.param(
                    "rectify_prompts", _stacked_xavier,
                    (p.rectify_prompts_depth, p.rectify_prompts_num, C))
            if p.pretask_prompts and p.pretask_prompts_depth:
                prompts["pretask"] = self.param(
                    "pretask_prompts", _stacked_xavier,
                    (p.pretask_prompts_depth, p.pretask_prompts_num, C))
            if p.downstream_prompts and p.downstream_prompts_depth:
                prompts["downstream"] = self.param(
                    "downstream_prompts", _stacked_xavier,
                    (p.downstream_prompts_depth, p.downstream_prompts_num, C))
        self._adapters = adapters
        self._prompts = prompts

    # ------------------------------------------------------------------
    def __call__(self, x, pos, *, path: str, classification: bool = False,
                 propagation=None, deterministic: bool = True,
                 feature_blocks: tuple = ()):
        p = self.prompter
        if self.is_decoder:
            run_depth, path = self.depth, "pretask"
        else:
            run_depth = {"rectify": p.rectify_depth or self.depth,
                         "pretask": p.pretask_depth or self.depth}.get(
                path, self.depth)
        prompt_depth = 0
        if not self.is_decoder and path in self._prompts:
            prompt_depth = min(self._prompts[path].shape[0], run_depth)
        if self.is_initializing():
            run_depth = self.depth

        rng = (self.make_rng("dropout")
               if (not deterministic and self.has_rng("dropout")) else None)
        dpr_full = jnp.asarray(
            [self.drop_path_rate * i / max(self.depth - 1, 1)
             for i in range(self.depth)], jnp.float32)
        adapter_len = (0 if path not in self._adapters else
                       next(iter(self._adapters[path].values())).shape[0])

        taps: list = []
        stats_updates: list = []

        def run_segment(x, lo, hi, prompted):
            if hi <= lo:
                return x
            n = hi - lo
            xs: Dict[str, Any] = {name: getattr(self, name)[lo:hi]
                                  for name in BACKBONE_LEAVES}
            xs["dpr"] = dpr_full[lo:hi]
            if rng is not None:
                xs["rng"] = jax.random.split(jax.random.fold_in(rng, lo), n)
            use_adapter = adapter_len >= hi
            if use_adapter:
                xs["adapter"] = {k: v[lo:hi]
                                 for k, v in self._adapters[path].items()}
            if prompted:
                xs["prompts"] = self._prompts[path][lo:hi]
            use_prop = prompted and propagation is not None
            if use_prop:
                xs["bnorm"] = {"scale": self.bnorm_scale[lo:hi],
                               "bias": self.bnorm_bias[lo:hi],
                               "mean": self.bnorm_mean.value[lo:hi],
                               "var": self.bnorm_var.value[lo:hi]}
            collect_taps = bool(feature_blocks)

            def body(carry, sl):
                h, stats = self._block(
                    carry, pos, sl, prompted=prompted, use_adapter=use_adapter,
                    use_prop=use_prop, classification=classification,
                    propagation=propagation, deterministic=deterministic)
                y = (h if collect_taps else None, stats)
                return h, y

            if self.remat:
                # policy sweep (v5e, flagship step): none 64.0, full remat
                # 60.4, dots_saveable 65.1, dots_with_no_batch_dims 59.6 ms
                body = jax.checkpoint(
                    body, prevent_cse=False,
                    policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
            # Unroll policy: every scan iteration is latency-bound at these
            # token counts (~0.7 ms/block vs ~0.1 ms roofline — the fwd+bwd
            # whiles were 20 of the 50 ms MAE-pretrain grad, xprof r4), so
            # unrolling lets XLA pipeline across blocks. Step times (v5e,
            # r4 sweep): pretrain 65.6 -> 56.3 ms/step with FULL unroll;
            # flagship/pretask/seg step-neutral between unroll 4 and full.
            # Cold compile (r5, controlled: fresh process, cache disabled,
            # BASELINE.md "Compile-time budget"): flagship rolled 132 s /
            # unroll=4 429 s / full 131 s; seg rolled 122 s / unroll=4 560 s.
            # PARTIAL unroll (4) is the XLA pathology — ~3-4x slower to
            # compile than either extreme — so every stack now defaults to
            # FULL unroll (None), the fastest-or-tied choice on both axes.
            # (r4's in-code claim that rolled compiled slowest came from
            # uncontrolled measurements confounded by cache state.)
            unroll = max(1, min(_effective_unroll(self.unroll, int(n)),
                                int(n)))
            # trace-time (once per compiled shape), so the effective unroll
            # of every stack is on record for compile/step investigations
            logging.getLogger("upp_tpu.scan_blocks").info(
                "trace depth=%d segment=[%d,%d) unroll=%d",
                self.depth, lo, hi, unroll)
            x, (ys, stats) = jax.lax.scan(body, x, xs, unroll=unroll)
            if use_prop and stats is not None:
                stats_updates.append((lo, hi, stats))
            if collect_taps:
                for i in range(n):
                    if (lo + i) in feature_blocks:
                        taps.append(ys[i])
            return x

        if prompt_depth:
            x = run_segment(x, 0, prompt_depth, prompted=True)
            x = run_segment(x, prompt_depth, run_depth, prompted=False)
        else:
            x = run_segment(x, 0, run_depth, prompted=False)

        if stats_updates and not deterministic and not self.is_initializing():
            mean, var = self.bnorm_mean.value, self.bnorm_var.value
            for lo, hi, (m_new, v_new) in stats_updates:
                mean = mean.at[lo:hi].set(m_new)
                var = var.at[lo:hi].set(v_new)
            self.bnorm_mean.value = mean
            self.bnorm_var.value = var

        if feature_blocks:
            return x, taps
        return x

    # ------------------------------------------------------------------
    def _block(self, x, pos, sl, *, prompted, use_adapter, use_prop,
               classification, propagation, deterministic):
        rng = sl.get("rng")
        dp_rate = sl["dpr"]
        x = x + pos
        num_prompts = 0
        if prompted:
            ptok = jnp.broadcast_to(sl["prompts"][None],
                                    (x.shape[0],) + sl["prompts"].shape)
            num_prompts = ptok.shape[1]
            if classification:
                x = jnp.concatenate([x[:, :1], ptok, x[:, 1:]], axis=1)
            else:
                x = jnp.concatenate([ptok, x], axis=1)

        # attention
        B, N, C = x.shape
        H = self.num_heads
        hd = C // H
        cd = self.compute_dtype
        h = _layer_norm(x, sl["norm1_scale"], sl["norm1_bias"])
        qkv = jnp.einsum("bnc,ck->bnk", h.astype(cd),
                         sl["attn_qkv_kernel"].astype(cd),
                         preferred_element_type=jnp.float32)
        qkv = qkv.reshape(B, N, 3, H, hd)
        qkv = qkv.transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0].astype(cd), qkv[1].astype(cd), qkv[2].astype(cd)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32) * hd ** -0.5
        attn = jax.nn.softmax(attn, axis=-1)
        h = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(cd), v,
                       preferred_element_type=jnp.float32)
        h = h.transpose(0, 2, 1, 3).reshape(B, N, C)
        h = jnp.einsum("bnc,ck->bnk", h.astype(cd),
                       sl["attn_proj_kernel"].astype(cd),
                       preferred_element_type=jnp.float32) + sl["attn_proj_bias"]
        x = x + _drop_path(h, dp_rate, rng, deterministic, salt=0)

        # MLP
        h = _layer_norm(x, sl["norm2_scale"], sl["norm2_bias"])
        h = jnp.einsum("bnc,ck->bnk", h.astype(cd),
                       sl["mlp_fc1_kernel"].astype(cd),
                       preferred_element_type=jnp.float32) + sl["mlp_fc1_bias"]
        h = jax.nn.gelu(h, approximate=False)
        h = _dropout(h, self.drop, rng, deterministic, salt=1)
        h = jnp.einsum("bnc,ck->bnk", h.astype(cd),
                       sl["mlp_fc2_kernel"].astype(cd),
                       preferred_element_type=jnp.float32) + sl["mlp_fc2_bias"]
        h = _dropout(h, self.drop, rng, deterministic, salt=2)
        x = x + _drop_path(h, dp_rate, rng, deterministic, salt=1)

        stats = None
        if prompted and use_prop:
            x, stats = self._propagate(x, sl, num_prompts, classification,
                                       propagation, dp_rate, rng, deterministic)
        elif use_prop:
            stats = None

        if prompted:
            if classification:
                x = jnp.concatenate([x[:, :1], x[:, num_prompts + 1:]], axis=1)
            else:
                x = x[:, num_prompts:]

        if use_adapter:
            a = sl["adapter"]
            h = _layer_norm(x, a["layer_norm_scale"], a["layer_norm_bias"])
            h = h @ a["ln1_kernel"] + a["ln1_bias"]
            h = jax.nn.gelu(h, approximate=False)
            h = _dropout(h, 0.1, rng, deterministic, salt=3)
            h = h @ a["ln2_kernel"] + a["ln2_bias"]
            x = x + h * 0.7
        return x, stats

    def _propagate(self, x, sl, num_prompts, classification, propagation,
                   dp_rate, rng, deterministic):
        """Geometry-aware prompt propagation.

        Three gather modes, selected by the propagation dict:

        * quirk + gather_idx=False (DEFAULT; the reference's shipped cls
          configs): the reference flattens the prompt-augmented token tensor
          to ``[B*(prompts+g), C]`` but offsets the kNN indices by ``b*g``
          (``Point_MAE_pretask_dev.py:291-293`` with indices built by
          ``Point_MAE_unify.py:74-80``) — so the gathered rows are shifted
          into the prompt region and, for b>0, read the PREVIOUS sample's
          rows. The released checkpoints were trained with exactly this
          behaviour, so we reproduce it bit-for-bit (verified against the
          torch code in tests/test_full_model_parity.py).
        * quirk + gather_idx=True (the reference's seg config): per-sample
          gather, but still indexed into the prompt-augmented body, i.e.
          index i < num_prompts reads a prompt token.
        * clean (opt-in via model cfg ``propagation_semantics: clean``): the
          intended semantics — indices address the g group tokens only. Use
          for from-scratch training; NOT checkpoint-compatible with the
          reference's cls/seg heads.
        """
        B = x.shape[0]
        cls_x = x[:, :1] if classification else None
        body = x[:, 1:] if classification else x
        g = propagation["center1"].shape[1]
        tokens = body[:, -g:]
        prefix = body[:, :-g]
        n_idx = propagation["center1_idx"]
        c_idx = propagation["center2_idx"]
        g2, k = n_idx.shape[1], n_idx.shape[2]
        C = tokens.shape[-1]
        quirk = propagation.get("quirk", True)
        if quirk and not propagation.get("gather_idx", False):
            # reference flat-index path: row stride is prompts+g, offsets are
            # b*g → off-by-prompts and cross-batch reads, kept verbatim
            g_tot = body.shape[1]
            flat = body.reshape(B * g_tot, C)
            off = (jnp.arange(B, dtype=n_idx.dtype) * g)[:, None, None]
            neigh = jnp.take(flat, (n_idx + off).reshape(-1), axis=0,
                             indices_are_sorted=False,
                             unique_indices=False).reshape(B, g2, k, C)
            centers = jnp.take(flat, (c_idx + off[:, :, 0]).reshape(-1),
                               axis=0).reshape(B, g2, C)
        else:
            # source rows: prompt-augmented body (reference gather_idx=True)
            # or the g group tokens alone (clean semantics)
            src = body if quirk else tokens
            S = src.shape[1]
            oh_n = (n_idx.reshape(B, -1)[..., None] == jnp.arange(S)).astype(src.dtype)
            neigh = jnp.einsum("bks,bsc->bkc", oh_n, src,
                               preferred_element_type=jnp.float32).reshape(B, g2, k, C)
            oh_c = (c_idx[..., None] == jnp.arange(S)).astype(src.dtype)
            centers = jnp.einsum("bks,bsc->bkc", oh_c, src,
                                 preferred_element_type=jnp.float32)
        # reference quirk kept: droppath(x)+x doubles features at eval
        neigh = _drop_path(neigh, dp_rate, rng, deterministic, salt=2) + neigh

        flat = neigh.reshape(B * g2 * k, C)
        if deterministic:
            mean, var = sl["bnorm"]["mean"], sl["bnorm"]["var"]
            new_stats = None
        else:
            mean = jnp.mean(flat, axis=0)
            # one-pass E[x²]−E[x]² (jnp.var re-reads the activations)
            var = jnp.maximum(jnp.mean(flat * flat, axis=0) - mean * mean, 0.0)
            # torch folds the UNBIASED variance into the running average
            # (normalisation stays biased) — see layers.TorchBatchNorm
            n = flat.shape[0]
            new_stats = (0.9 * sl["bnorm"]["mean"] + 0.1 * mean,
                         0.9 * sl["bnorm"]["var"] + 0.1 * var
                         * (n / max(n - 1, 1)))
        y = (flat - mean) * jax.lax.rsqrt(var + 1e-5)
        y = y * sl["bnorm"]["scale"] + sl["bnorm"]["bias"]
        pooled = jnp.max(y.reshape(B, g2, k, C), axis=2)
        centers = pooled + 0.3 * centers
        tokens = tokens + 0.3 * inverse_distance_interp(
            propagation["center1"], propagation["center2"], centers,
            k=8, eps=1e-3)
        parts = ([cls_x] if classification else []) + [prefix, tokens]
        return jnp.concatenate(parts, axis=1), new_stats


class ScannedDecoderStack(nn.Module):
    """Scan-based MAE decoder (TransformerDecoderStack call surface)."""
    embed_dim: int
    depth: int
    num_heads: int
    drop_path_rate: float = 0.0
    compute_dtype: Any = jnp.float32
    remat: bool = False
    unroll: Optional[int] = None
    # pretask adapters in every block (the UPP decoders,
    # Point_MAE_pretask_dev.py:352-384). False = the vanilla Point_MAE
    # decoder (Point_MAE_cp.py:205-237), which has plain blocks.
    adapters: bool = True

    def setup(self):
        self.blocks = ScannedEncoderStack(
            embed_dim=self.embed_dim, depth=self.depth,
            num_heads=self.num_heads, drop_path_rate=self.drop_path_rate,
            is_decoder=True, plain=not self.adapters,
            compute_dtype=self.compute_dtype,
            remat=self.remat, unroll=self.unroll)
        self.norm = nn.LayerNorm()

    def __call__(self, x, pos, return_token_num: int, *,
                 deterministic: bool = True):
        x = self.blocks(x, pos, path="pretask", deterministic=deterministic)
        return self.norm(x[:, -return_token_num:])
