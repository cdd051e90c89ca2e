"""Numeric parity of the deformable attention family vs the reference torch
code (``models/Transformer_utils.py`` via ref_torch exec + CPU stubs).

Weights are built in torch and copied tensor-by-tensor into the flax modules;
inputs are shared; outputs must match to f32 tolerance. Neighbour sets (kNN /
3-NN interpolation) are permutation-invariant in every variant, so index
order differences between torch.topk(sorted=False) and lax.top_k don't
matter."""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp

from ref_torch import load_reference_transformer_utils
from upp_tpu.models.deform_attn import (DeformableGraphAttention,
                                        DeformableLocalAttention,
                                        DeformableLocalCrossAttention)

pytestmark = pytest.mark.quick

DIM, HEADS, K, NG = 32, 4, 10, 2
B, N, M = 2, 48, 64


def _lin(tl):  # torch Linear → flax Dense params
    p = {"kernel": jnp.asarray(tl.weight.detach().numpy().T)}
    if tl.bias is not None:
        p["bias"] = jnp.asarray(tl.bias.detach().numpy())
    return p


def _offset_mlp(seq):  # Sequential(Linear, LayerNorm, GELU, Linear(no bias))
    return {"lin0": _lin(seq[0]),
            "norm": {"scale": jnp.asarray(seq[1].weight.detach().numpy()),
                     "bias": jnp.asarray(seq[1].bias.detach().numpy())},
            "lin1": _lin(seq[3])}


def _rand(seed, *shape):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def _randomize(tm, seed):
    # re-init every parameter from a PRIVATE generator: module construction
    # draws from torch's global RNG whose state depends on what ran before
    # (flaky near-ties at kNN boundaries otherwise)
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.empty_like(p).uniform_(-0.2, 0.2, generator=g))
        for m in tm.modules():
            if isinstance(m, torch.nn.LayerNorm):
                m.weight.fill_(1.0)
                m.bias.zero_()


def test_deformable_local_cross_attention_parity():
    ns = load_reference_transformer_utils()
    tm = ns["DeformableLocalCrossAttention"](DIM, num_heads=HEADS, k=K,
                                             n_group=NG).eval()
    _randomize(tm, 0)
    q, q_pos = _rand(1, B, N, DIM), _rand(2, B, N, 3)
    v, v_pos = _rand(3, B, M, DIM), _rand(4, B, M, 3)
    with torch.no_grad():
        want = tm(torch.from_numpy(q), torch.from_numpy(q_pos),
                  v=torch.from_numpy(v), v_pos=torch.from_numpy(v_pos)).numpy()
    fm = DeformableLocalCrossAttention(DIM, HEADS, k=K, n_group=NG)
    params = {
        "proj_q": _lin(tm.proj_q), "proj_v_off": _lin(tm.proj_v_off),
        "proj_k": _lin(tm.proj_k), "proj_v": _lin(tm.proj_v),
        "proj": _lin(tm.proj),
        "resample": {"linear_offset": _offset_mlp(tm.linear_offset)},
    }
    got = fm.apply({"params": params}, jnp.asarray(q), jnp.asarray(q_pos),
                   v=jnp.asarray(v), v_pos=jnp.asarray(v_pos))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_deformable_local_attention_parity():
    ns = load_reference_transformer_utils()
    tm = ns["DeformableLocalAttention"](DIM, num_heads=HEADS, k=K,
                                        n_group=NG).eval()
    _randomize(tm, 5)
    x, pos = _rand(6, B, N, DIM), _rand(7, B, N, 3)
    with torch.no_grad():
        want = tm(torch.from_numpy(x), torch.from_numpy(pos)).numpy()
    fm = DeformableLocalAttention(DIM, HEADS, k=K, n_group=NG)
    params = {
        "proj_q": _lin(tm.proj_q), "proj_v_off": _lin(tm.proj_v_off),
        "proj_k": _lin(tm.proj_k), "proj_v": _lin(tm.proj_v),
        "proj": _lin(tm.proj),
        "resample": {"linear_offset": _offset_mlp(tm.linear_offset)},
    }
    got = fm.apply({"params": params}, jnp.asarray(x), jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_deformable_graph_attention_parity():
    ns = load_reference_transformer_utils()
    tm = ns["improvedDeformableLocalGraphAttention"](DIM, k=K).eval()
    _randomize(tm, 8)
    q, q_pos = _rand(9, B, N, DIM), _rand(10, B, N, 3)
    v, v_pos = _rand(11, B, M, DIM), _rand(12, B, M, 3)
    with torch.no_grad():
        want = tm(torch.from_numpy(q), torch.from_numpy(q_pos),
                  v=torch.from_numpy(v), v_pos=torch.from_numpy(v_pos)).numpy()
    fm = DeformableGraphAttention(DIM, k=K)
    params = {
        "proj_v_off": _lin(tm.proj_v_off),
        "linear_offset": _offset_mlp(tm.linear_offset),
        "knn_map": _lin(tm.knn_map[0]),
    }
    got = fm.apply({"params": params}, jnp.asarray(q), jnp.asarray(q_pos),
                   v=jnp.asarray(v), v_pos=jnp.asarray(v_pos))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_adapointr_blocks_with_deform_styles_run():
    """All block styles build and run through SelfAttnBlock/CrossAttnBlock
    (concat + onebyone combines), incl. the denoise split."""
    from upp_tpu.models.adapointr import CrossAttnBlock, SelfAttnBlock

    x, pos = jnp.asarray(_rand(20, B, N, DIM)), jnp.asarray(_rand(21, B, N, 3))
    v, vpos = jnp.asarray(_rand(22, B, M, DIM)), jnp.asarray(_rand(23, B, M, 3))
    for style in ("attn", "graph", "rw_deform", "deform", "deform_graph",
                  "attn-deform", "attn-deform_graph"):
        for combine in ("concat", "onebyone"):
            blk = SelfAttnBlock(DIM, HEADS, block_style=style,
                                combine_style=combine)
            variables = blk.init(jax.random.key(0), x, pos)
            out = blk.apply(variables, x, pos)
            assert out.shape == x.shape, (style, combine)
    blk = CrossAttnBlock(DIM, HEADS, self_style="attn-deform",
                         cross_style="attn-deform_graph")
    variables = blk.init(jax.random.key(1), x, v, pos, vpos)
    out = blk.apply(variables, x, v, pos, vpos, denoise_length=8)
    assert out.shape == x.shape


def test_adapointr_config_style_keys_reach_blocks():
    """`encoder_config.block_style_list` / `decoder_config.*_style*` config
    keys (the reference's PointTransformerEncoder/DecoderEntry surface,
    ``AdaPoinTr.py:389-476``) must actually select the block styles — the
    param tree must contain the style-specific modules."""
    from upp_tpu.models import build_model_from_cfg
    from upp_tpu.models.build import jit_init
    from upp_tpu.utils.config import ConfigDict

    cfg = ConfigDict.from_nested({
        "NAME": "AdaPoinTr",
        "num_query": 16, "num_points": 256, "decoder_type": "fc",
        "encoder_config": {
            "embed_dim": 48, "depth": 2,
            "block_style_list": ["attn-deform", "attn"],
            "combine_style": "concat"},
        "decoder_config": {
            "embed_dim": 48, "depth": 2,
            "self_attn_block_style_list": ["attn-graph", "attn"],
            "self_attn_combine_style": "onebyone",
            "cross_attn_block_style_list": ["attn-deform_graph", "attn"],
            "cross_attn_combine_style": "concat"},
    })
    model = build_model_from_cfg(cfg)
    pts = jnp.zeros((2, 128, 3), jnp.float32)
    variables = jit_init(model, {"params": jax.random.key(0),
                                 "denoise": jax.random.key(1)},
                         pts, deterministic=True)
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    names = {"/".join(str(getattr(k, "key", k)) for k in path)
             for path, _ in flat}
    joined = " ".join(names)
    # encoder block 0: attn-deform concat -> merge map + deformable module
    assert "encoder0/merge_map" in joined, joined[:500]
    assert "encoder0/local_attn" in joined
    assert "encoder1/merge_map" not in joined        # plain attn block
    # decoder block 0: onebyone self (graph module, no merge map); cross
    # concat with deform_graph (merge map present)
    assert "decoder0/local_self_attn" in joined
    assert "decoder0/self_attn_merge_map" not in joined
    assert "decoder0/cross_attn_merge_map" in joined
    # and the model still runs
    out = model.apply(variables, pts, deterministic=True)
    assert out[0].shape[0] == 2
