"""Torch checkpoint EXPORT (upp_tpu/train/torch_export.py).

Round-trip contract: reference torch model → .pth → flax (the proven
import shim) → export_torch_state_dict(template=torch model) → every
non-synthesized tensor matches the original bitwise-closely, the exported
dict loads back into a FRESH reference model with ``strict=True``, and
that model's forward matches the flax forward. Whatever the importer can
place, the exporter reproduces — by construction it routes template keys
through the importer's own translators.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from ref_torch import RefCfg, load_reference_models, randomize_bn_stats  # noqa: E402
from upp_tpu.models import build_model_from_cfg  # noqa: E402
from upp_tpu.train.torch_ckpt import (load_into_variables,  # noqa: E402
                                      load_torch_state_dict)
from upp_tpu.train.torch_export import (export_torch_state_dict,  # noqa: E402
                                        save_as_torch)
from upp_tpu.utils.config import ConfigDict  # noqa: E402

pytestmark = pytest.mark.slow

# full-scale flagship dims: the reference hardcodes several head widths to
# the 64-group / 384-dim anchor (see _UnifyCore.vis_num note), so shrunken
# configs diverge structurally from the torch source
SMALL = {
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
POINT_NUM = 512


def _randomize(tm, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in tm.parameters():
            p.add_(torch.empty_like(p).uniform_(-0.02, 0.02, generator=g))
    randomize_bn_stats(tm, seed + 1)


def _import_into_flax(tm, tmp_path):
    path = str(tmp_path / "src.pth")
    torch.save({"base_model": tm.state_dict()}, path)
    fm = build_model_from_cfg(ConfigDict.from_nested(SMALL))
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2)}
    variables = dict(fm.init(rngs, jnp.zeros((2, POINT_NUM + 72, 3)),
                             completion_prompt=True, denoise=True,
                             point_num=POINT_NUM, deterministic=True))
    variables.setdefault("batch_stats", {})
    loaded, missing, unexpected = load_into_variables(
        variables, load_torch_state_dict(path))
    assert not missing and not unexpected
    return fm, loaded


@pytest.fixture(scope="module")
def trip(tmp_path_factory):
    ns = load_reference_models()
    torch.manual_seed(0)
    tm = ns["unify"]["Point_MAE_unify"](RefCfg(SMALL)).eval()
    _randomize(tm, seed=21)
    fm, loaded = _import_into_flax(tm, tmp_path_factory.mktemp("pth"))
    state, report = export_torch_state_dict(loaded, tm)
    return tm, fm, loaded, state, report


def test_export_covers_full_state_dict(trip):
    tm, _, _, state, report = trip
    sd = tm.state_dict()
    assert report["missing"] == [], report["missing"][:10]
    assert set(state.keys()) == set(sd.keys())
    # only genuinely-unused leaves may be synthesized
    for k in report["synthesized"]:
        assert ("num_batches_tracked" in k or ".scale." in k
                or "group_divider" in k or k.startswith("loss")), k


def test_export_matches_source_tensors(trip):
    tm, _, _, state, report = trip
    sd = tm.state_dict()
    synth = set(report["synthesized"])
    checked = 0
    for k, v in sd.items():
        if k in synth:
            continue
        np.testing.assert_allclose(state[k], v.detach().numpy(),
                                   rtol=1e-6, atol=1e-7, err_msg=k)
        checked += 1
    assert checked > 300   # the full stacked/seq/prompter key surface


def test_export_strict_loads_and_forward_parity(trip):
    tm, fm, loaded, state, _ = trip
    ns = load_reference_models()
    torch.manual_seed(0)
    tm2 = ns["unify"]["Point_MAE_unify"](RefCfg(SMALL)).eval()
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in state.items()}
    tm2.load_state_dict(tensors, strict=True)

    rng = np.random.default_rng(3)
    pts = rng.standard_normal((2, POINT_NUM, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm2(torch.from_numpy(pts), completion_prompt=False,
                   denoise=False, point_num=POINT_NUM).numpy()
    got = fm.apply(loaded, jnp.asarray(pts), completion_prompt=False,
                   denoise=False, point_num=POINT_NUM, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-3)


def test_save_as_torch_reimports_bitwise(trip, tmp_path):
    """flax → save_as_torch(.pth) → the import shim → identical flax leaves
    (the full both-directions cycle through the file format)."""
    tm, fm, loaded, _, _ = trip
    path = str(tmp_path / "roundtrip.pth")
    report = save_as_torch(loaded, path, tm)
    assert report["missing"] == []

    rngs = {"params": jax.random.key(9), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2)}
    fresh = dict(fm.init(rngs, jnp.zeros((2, POINT_NUM + 72, 3)),
                         completion_prompt=True, denoise=True,
                         point_num=POINT_NUM, deterministic=True))
    fresh.setdefault("batch_stats", {})
    re_loaded, missing, unexpected = load_into_variables(
        fresh, load_torch_state_dict(path))
    assert not missing and not unexpected

    flat_a = jax.tree_util.tree_leaves_with_path(loaded["params"])
    flat_b = dict(jax.tree_util.tree_leaves_with_path(re_loaded["params"]))
    # tree_leaves_with_path returns list of (path, leaf); build dict for b
    flat_b = {tuple(p): l for p, l in
              jax.tree_util.tree_leaves_with_path(re_loaded["params"])}
    for p, leaf in flat_a:
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(flat_b[tuple(p)]),
                                   rtol=0, atol=0, err_msg=str(p))


def test_export_cli_script(trip, tmp_path):
    """scripts/export_torch_ckpt.py: orbax ckpt + template .pth → .pth that
    strict-loads into the reference model."""
    import subprocess

    tm, _, loaded, _, _ = trip
    from upp_tpu.train import checkpoint as ckpt
    from upp_tpu.train.state import TrainState

    state = TrainState(params=loaded["params"],
                       batch_stats=loaded.get("batch_stats", {}),
                       opt_state=[np.float32(0.0)], step=0)
    ckpt.save_checkpoint(state, epoch=0, prefix="ckpt-best",
                         experiment_path=str(tmp_path), logger="silent",
                         block=True)
    template = str(tmp_path / "template.pth")
    torch.save({"base_model": tm.state_dict()}, template)
    out = str(tmp_path / "exported.pth")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "export_torch_ckpt.py"),
         "--ckpt", str(tmp_path / "ckpt-best"), "--template", template,
         "--out", out],
        capture_output=True, text=True, env=env, cwd=repo, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr

    ns = load_reference_models()
    torch.manual_seed(0)
    tm2 = ns["unify"]["Point_MAE_unify"](RefCfg(SMALL)).eval()
    exported = torch.load(out, map_location="cpu",
                          weights_only=True)["base_model"]
    tm2.load_state_dict(exported, strict=True)
    for k, v in tm.state_dict().items():
        if "num_batches_tracked" in k or ".scale." in k:
            continue
        np.testing.assert_allclose(exported[k].numpy(), v.detach().numpy(),
                                   rtol=1e-6, atol=1e-7, err_msg=k)


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


def test_seg_export_roundtrip(tmp_path):
    """Point_MAE_unify_seg: the seg-only key families (label_conv,
    propagation_0, seg_head) export tensor-exact and strict-load back."""
    from ref_torch import load_reference_seg

    ns = load_reference_seg()
    torch.manual_seed(0)
    tm = ns["Point_MAE_unify_seg"](RefCfg(SEG_MODEL)).eval()
    _randomize(tm, seed=31)

    path = str(tmp_path / "seg.pth")
    torch.save({"base_model": tm.state_dict()}, path)
    fm = build_model_from_cfg(ConfigDict.from_nested(SEG_MODEL))
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2)}
    P_in, N_full = 1624, 2048
    variables = dict(fm.init(rngs, jnp.zeros((2, P_in, 3), jnp.float32),
                             jnp.zeros((2, 16), jnp.float32),
                             jnp.zeros((2, N_full, 3), jnp.float32),
                             completion_prompt=True, denoise=True,
                             point_num=P_in, deterministic=True))
    variables.setdefault("batch_stats", {})
    loaded, missing, unexpected = load_into_variables(
        variables, load_torch_state_dict(path))
    assert not missing and not unexpected

    state, report = export_torch_state_dict(loaded, tm)
    assert report["missing"] == [], report["missing"][:10]
    sd = tm.state_dict()
    synth = set(report["synthesized"])
    for fam in ("label_conv", "propagation_0", "seg_head"):
        keys = [k for k in sd if k.startswith(fam) and k not in synth]
        assert keys, f"no exported keys for {fam}"
        for k in keys:
            np.testing.assert_allclose(state[k], sd[k].detach().numpy(),
                                       rtol=1e-6, atol=1e-7, err_msg=k)
    tm2 = ns["Point_MAE_unify_seg"](RefCfg(SEG_MODEL)).eval()
    tm2.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in state.items()}, strict=True)


def test_mae_pretrain_export_roundtrip(tmp_path):
    """Vanilla Point_MAE (pretraining family): increase_dim + MAE decoder
    naming export tensor-exact and strict-load back (warm-start handoff of
    a framework-pretrained backbone to reference finetuning)."""
    from ref_torch import load_reference_mae

    cfg = {"NAME": "Point_MAE", "group_size": 8, "num_group": 16,
           "loss": "cdl2",
           "transformer_config": {
               "mask_ratio": 0.5, "mask_type": "rand", "trans_dim": 48,
               "encoder_dims": 48, "depth": 2, "drop_path_rate": 0.0,
               "num_heads": 4, "decoder_depth": 2, "decoder_num_heads": 4}}
    ns = load_reference_mae()
    torch.manual_seed(0)
    tm = ns["Point_MAE"](RefCfg(cfg)).eval()
    _randomize(tm, seed=41)

    path = str(tmp_path / "mae.pth")
    torch.save({"base_model": tm.state_dict()}, path)
    fm = build_model_from_cfg(ConfigDict.from_nested(cfg))
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2), "mask": jax.random.key(3)}
    variables = dict(fm.init(rngs, jnp.zeros((2, 128, 3), jnp.float32),
                             deterministic=False))
    variables.setdefault("batch_stats", {})
    loaded, missing, unexpected = load_into_variables(
        variables, load_torch_state_dict(path))
    assert not missing and not unexpected, (missing[:5], unexpected[:5])

    state, report = export_torch_state_dict(loaded, tm)
    assert report["missing"] == [], report["missing"][:10]
    sd = tm.state_dict()
    synth = set(report["synthesized"])
    for k, v in sd.items():
        if k in synth:
            continue
        np.testing.assert_allclose(state[k], v.detach().numpy(),
                                   rtol=1e-6, atol=1e-7, err_msg=k)
    tm2 = ns["Point_MAE"](RefCfg(cfg)).eval()
    tm2.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in state.items()}, strict=True)


def test_shape_manifest_template(trip):
    """A bare {key: shape} manifest works as the template (no torch model
    needed at export time)."""
    tm, _, loaded, state, _ = trip
    manifest = {k: tuple(v.shape) for k, v in tm.state_dict().items()}
    state2, report = export_torch_state_dict(loaded, manifest)
    assert report["missing"] == []
    for k in state:
        np.testing.assert_allclose(np.asarray(state2[k], np.float32),
                                   np.asarray(state[k], np.float32),
                                   rtol=0, atol=0, err_msg=k)
