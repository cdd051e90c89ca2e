"""END-TO-END numeric parity: the reference's torch ``Point_MAE_unify`` /
``Point_MAE_pretask_dev`` vs our flax rebuild, same weights, same inputs.

The reference models run on CPU via ``ref_torch`` (CUDA ops stubbed with
exact-semantics torch equivalents); weights flow torch → flax through the
production ckpt shim (``upp_tpu/train/torch_ckpt.py``), so this additionally
asserts the shim maps EVERY tensor of the full flagship tree (no missing, no
unexpected).

This is the strongest accuracy-parity evidence available without the real
datasets/checkpoints (zero-egress container): if every pass of the full model
reproduces the torch numerics to f32 tolerance, accuracy on real data follows
from the reference's own published numbers.

Covers: downstream-only (prompt propagation incl. the undefined-``pooling``
BN+max path and the droppath x+x eval quirk), denoise (rectify prompter +
top-5% drop), the full 3-pass forward (rectify → completion → downstream),
and the pretask model's eval pass (``Point_MAE_pretask_dev.py:655-741``).

Reference: models/Point_MAE_unify.py:390-655, Point_MAE_pretask_dev.py:521-741.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp

from ref_torch import RefCfg, load_reference_models, randomize_bn_stats
from upp_tpu.models import build_model_from_cfg
from upp_tpu.train.torch_ckpt import load_into_variables, load_torch_state_dict
from upp_tpu.utils.config import ConfigDict

pytestmark = pytest.mark.slow  # ~2-4 min: full-scale (384-dim, depth-12) model

FLAGSHIP = {
    "NAME": "Point_MAE_unify",
    "transformer_config": {
        "mask_ratio": 0.5, "mask_type": "rand", "trans_dim": 384,
        "encoder_dims": 384, "depth": 12, "drop_path_rate": 0.1,
        "num_heads": 6, "decoder_depth": 4, "decoder_num_heads": 6},
    "cls_dim": 40, "group_size": 32, "num_group": 64,
    "prompter_config": {
        "rectify_adapter": True, "rectify_prompts": True,
        "rectify_prompts_num": 3, "rectify_prompts_depth": 3,
        "rectify_depth": 3,
        "pretask_adapter": True, "pretask_prompts": True,
        "pretask_prompts_num": 3, "pretask_prompts_depth": 6,
        "pretask_depth": 6,
        "downstream_adapter": True, "downstream_prompts": True,
        "downstream_prompts_num": 10, "downstream_prompts_depth": 6,
        "downstream_depth": 12},
    "gather_idx": False, "prompt_propagation_after": True,
}
POINT_NUM = 1024


def _randomize_weights(tm: torch.nn.Module, seed: int) -> None:
    """Non-degenerate weights everywhere (fresh init leaves prompts zero and
    heads symmetric, which would mask mapping errors)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in tm.parameters():
            p.add_(torch.empty_like(p).uniform_(-0.02, 0.02, generator=g))
    randomize_bn_stats(tm, seed + 1)


def _export(tmp_path, tm) -> str:
    path = str(tmp_path / "full.pth")
    torch.save({"base_model": tm.state_dict()}, path)
    return path


@pytest.fixture(scope="module")
def unify_pair(tmp_path_factory):
    """(torch model, flax model, flax variables) with identical weights."""
    ns = load_reference_models()
    # torch default init draws from the GLOBAL RNG (entropy-seeded): pin it so
    # the weight draw — and hence the f32 parity error margin — is identical
    # standalone and mid-suite (the 3-pass test sits closest to tolerance).
    torch.manual_seed(0)
    tm = ns["unify"]["Point_MAE_unify"](RefCfg(FLAGSHIP)).eval()
    _randomize_weights(tm, seed=7)
    path = _export(tmp_path_factory.mktemp("pth"), tm)

    fm = build_model_from_cfg(ConfigDict.from_nested(FLAGSHIP))
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2)}
    pts = jnp.zeros((2, POINT_NUM + 72, 3), jnp.float32)
    variables = dict(fm.init(rngs, pts, completion_prompt=True, denoise=True,
                             point_num=POINT_NUM, deterministic=True))
    variables.setdefault("batch_stats", {})
    loaded, missing, unexpected = load_into_variables(
        variables, load_torch_state_dict(path))
    assert not unexpected, f"shim couldn't place: {unexpected[:10]}"
    assert not missing, f"model params not in ckpt: {missing[:10]}"
    return tm, fm, loaded


def _pts(seed, n=POINT_NUM + 72, b=2):
    return np.random.default_rng(seed).standard_normal((b, n, 3)).astype(np.float32)


def _run_both(unify_pair, pts, *, completion_prompt, denoise):
    tm, fm, variables = unify_pair
    with torch.no_grad():
        want = tm(torch.from_numpy(pts), completion_prompt=completion_prompt,
                  denoise=denoise, point_num=POINT_NUM).numpy()
    got = np.asarray(fm.apply(variables, jnp.asarray(pts),
                              completion_prompt=completion_prompt,
                              denoise=denoise, point_num=POINT_NUM,
                              deterministic=True))
    return got, want


def test_downstream_pass_parity(unify_pair):
    """Downstream-only: 12 prompted blocks + propagation + cls head."""
    got, want = _run_both(unify_pair, _pts(0, n=POINT_NUM),
                          completion_prompt=False, denoise=False)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_denoise_plus_downstream_parity(unify_pair):
    """Rectify pass (3 blocks + RectifyPrompter) + top-5% drop + downstream."""
    got, want = _run_both(unify_pair, _pts(1),
                          completion_prompt=False, denoise=True)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_full_three_pass_parity(unify_pair):
    """The flagship path: denoise → completion (6 blocks + MAE decoder +
    dense rebuild + re-FPS) → downstream classification."""
    got, want = _run_both(unify_pair, _pts(2),
                          completion_prompt=True, denoise=True)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_pretask_eval_parity(tmp_path):
    """Point_MAE_pretask_dev eval pass: pretask blocks → coarse centers →
    propagated mask tokens → decoder → dense rebuild."""
    cfg_dict = dict(FLAGSHIP, NAME="Point_MAE_pretask_dev")
    ns = load_reference_models()
    torch.manual_seed(0)  # pin global-RNG default init (see unify_pair)
    tm = ns["dev"]["Point_MAE_pretask_dev"](RefCfg(cfg_dict)).eval()
    _randomize_weights(tm, seed=11)
    path = _export(tmp_path, tm)

    fm = build_model_from_cfg(ConfigDict.from_nested(cfg_dict))
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2)}
    # init through the TRAINING path so the rectify branch's params
    # materialize (eval-only tracing would skip the prompter submodule)
    pts_shape = jnp.zeros((2, 2048 + 128, 3), jnp.float32)
    variables = dict(fm.init(rngs, pts_shape, point_num=2048,
                             train_with_gaussian=True, deterministic=False))
    variables.setdefault("batch_stats", {})
    loaded, missing, unexpected = load_into_variables(
        variables, load_torch_state_dict(path))
    assert not unexpected, f"shim couldn't place: {unexpected[:10]}"
    assert not missing, f"model params not in ckpt: {missing[:10]}"

    pts = _pts(3, n=2048)
    with torch.no_grad():
        w_center, w_rebuild = tm(torch.from_numpy(pts), point_num=2048,
                                 train_with_gaussian=False)
    g_center, g_rebuild = fm.apply(loaded, jnp.asarray(pts), point_num=2048,
                                   train_with_gaussian=False,
                                   deterministic=True)
    np.testing.assert_allclose(np.asarray(g_center), w_center.numpy(),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g_rebuild), w_rebuild.numpy(),
                               rtol=1e-3, atol=2e-3)


SEG_MODEL = {
    "NAME": "Point_MAE_unify_seg",
    "transformer_config": {
        "mask_ratio": 0.5, "mask_type": "rand", "trans_dim": 384,
        "encoder_dims": 384, "depth": 12, "drop_path_rate": 0.1,
        "num_heads": 6, "decoder_depth": 4, "decoder_num_heads": 6},
    "trans_dim": 384, "depth": 12, "drop_path_rate": 0.1, "if_half": False,
    "cls_dim": 50, "num_heads": 6, "group_size": 32, "num_group": 128,
    "encoder_dims": 384,
    "adapter_config": {"adapter_dim": 16, "adapter_drop_path_rate": 0.1},
    "prompter_config": {
        "rectify_adapter": True, "rectify_prompts": True,
        "rectify_prompts_num": 3, "rectify_prompts_depth": 3,
        "rectify_depth": 3,
        "pretask_adapter": True, "pretask_prompts": True,
        "pretask_prompts_num": 3, "pretask_prompts_depth": 6,
        "pretask_depth": 6,
        "downstream_adapter": True, "downstream_prompts": True,
        "downstream_prompts_num": 1, "downstream_prompts_depth": 6,
        "downstream_depth": 12},
    "gather_idx": True, "prompt_propagation_after": False,
}


def test_unify_seg_full_model_parity(tmp_path):
    """Point_MAE_unify_seg end-to-end: denoise → completion → 128-group
    downstream with {3,7,11} feature taps → label_conv conditioning →
    propagation_0 to the full-resolution query → log-softmax seg head
    (``Point_MAE_unify_segment.py:329-620``), reference torch vs flax on
    identical weights through the production ckpt shim."""
    from ref_torch import load_reference_seg

    ns = load_reference_seg()
    torch.manual_seed(0)
    tm = ns["Point_MAE_unify_seg"](RefCfg(SEG_MODEL)).eval()
    _randomize_weights(tm, seed=5)
    randomize_bn_stats(tm, seed=6)

    P_in, N_full, point_num = 1624, 2048, 1624
    rng = np.random.default_rng(8)
    pts = rng.standard_normal((2, P_in, 3)).astype(np.float32)
    label_points = rng.standard_normal((2, N_full, 3)).astype(np.float32)
    one_hot = np.zeros((2, 16), np.float32)
    one_hot[0, 3] = one_hot[1, 11] = 1.0

    with torch.no_grad():
        w_out = tm(torch.from_numpy(pts), torch.from_numpy(one_hot),
                   label_points=torch.from_numpy(label_points),
                   completion_prompt=True, denoise=True, point_num=point_num)

    path = str(tmp_path / "seg.pth")
    torch.save({"base_model": tm.state_dict()}, path)
    fm = build_model_from_cfg(ConfigDict.from_nested(SEG_MODEL))
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2)}
    variables = dict(fm.init(rngs, jnp.zeros((2, P_in, 3), jnp.float32),
                             jnp.asarray(one_hot),
                             jnp.zeros((2, N_full, 3), jnp.float32),
                             completion_prompt=True, denoise=True,
                             point_num=point_num, deterministic=True))
    variables.setdefault("batch_stats", {})
    loaded, missing, unexpected = load_into_variables(
        variables, load_torch_state_dict(path))
    assert not unexpected, f"shim couldn't place: {unexpected[:10]}"
    assert not missing, f"model params not in ckpt: {missing[:10]}"

    g_out = fm.apply(loaded, jnp.asarray(pts), jnp.asarray(one_hot),
                     jnp.asarray(label_points), completion_prompt=True,
                     denoise=True, point_num=point_num, deterministic=True)
    w = w_out.numpy() if not isinstance(w_out, tuple) else w_out[0].numpy()
    np.testing.assert_allclose(np.asarray(g_out), w, rtol=2e-3, atol=2e-3)
