"""Model zoo: init + forward shape/finite checks for every registered model,
plus prompt-path behaviour of the prompted block stack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from upp_tpu.models import MODELS, build_model_from_cfg
from upp_tpu.utils.config import ConfigDict


def small_model_cfg(name="Point_MAE_unify", cls_dim=5, num_group=16, group_size=8,
                    with_downstream=True):
    prompter = {
        "rectify_adapter": True, "rectify_prompts": True,
        "rectify_prompts_num": 2, "rectify_prompts_depth": 2, "rectify_depth": 2,
        "pretask_adapter": True, "pretask_prompts": True,
        "pretask_prompts_num": 2, "pretask_prompts_depth": 3, "pretask_depth": 3,
    }
    if with_downstream:
        prompter.update({
            "downstream_adapter": True, "downstream_prompts": True,
            "downstream_prompts_num": 3, "downstream_prompts_depth": 2,
            "downstream_depth": 4,
        })
    return ConfigDict.from_nested({
        "NAME": name,
        "transformer_config": {
            "mask_ratio": 0.5, "mask_type": "rand", "trans_dim": 48,
            "encoder_dims": 48, "depth": 4, "drop_path_rate": 0.1,
            "num_heads": 4, "decoder_depth": 2, "decoder_num_heads": 4,
        },
        "trans_dim": 48, "depth": 4, "drop_path_rate": 0.1, "cls_dim": cls_dim,
        "num_heads": 4, "group_size": group_size, "num_group": num_group,
        "encoder_dims": 48, "loss": "cdl2",
        "prompter_config": prompter,
        "gather_idx": False, "prompt_propagation_after": True,
    })


RNGS = {"params": jax.random.key(0), "dropout": jax.random.key(1),
        "droppath": jax.random.key(2), "mask": jax.random.key(3)}


def _pts(B=2, N=256, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal((B, N, 3)).astype(np.float32))


def test_point_transformer_forward():
    cfg = small_model_cfg("PointTransformer")
    model = build_model_from_cfg(cfg)
    pts = _pts()
    variables = model.init(RNGS, pts, deterministic=True)
    logits = model.apply(variables, pts, deterministic=True)
    assert logits.shape == (2, 5)
    assert np.isfinite(np.asarray(logits)).all()
    # train mode (BN batch stats mutable, dropout active)
    logits2, mutated = model.apply(variables, pts, deterministic=False,
                                   rngs=RNGS, mutable=["batch_stats"])
    assert logits2.shape == (2, 5)
    assert "batch_stats" in mutated


def test_unify_eval_path_plain_backbone():
    cfg = small_model_cfg()
    model = build_model_from_cfg(cfg)
    pts = _pts(2, 160)
    # init with ALL paths on so every param materialises
    variables = model.init(RNGS, _pts(2, 176, 1), completion_prompt=True,
                           denoise=True, point_num=160, deterministic=True)
    logits = model.apply(variables, pts, deterministic=True)
    assert logits.shape == (2, 5)
    assert np.isfinite(np.asarray(logits)).all()


def test_unify_noisy_train_path_shapes():
    cfg = small_model_cfg()
    model = build_model_from_cfg(cfg)
    point_num = 160
    pts = _pts(2, point_num + 16, 2)   # points + injected noise
    variables = model.init(RNGS, pts, completion_prompt=True, denoise=True,
                           point_num=point_num, deterministic=True)
    logits, mutated = model.apply(
        variables, pts, completion_prompt=True, denoise=True,
        point_num=point_num, deterministic=False, rngs=RNGS,
        mutable=["batch_stats"])
    assert logits.shape == (2, 5)
    assert np.isfinite(np.asarray(logits)).all()


def test_unify_params_contain_all_paths():
    cfg = small_model_cfg()
    model = build_model_from_cfg(cfg)
    variables = model.init(RNGS, _pts(2, 176, 1), completion_prompt=True,
                           denoise=True, point_num=160, deterministic=True)
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    names = {"/".join(str(k) for k in path) for path, _ in flat}
    joined = " ".join(names)
    for needle in ["rectify_prompts", "pretask_prompts", "downstream_prompts",
                   "rectify_adapter", "pretask_adapter", "downstream_adapter",
                   "rectify_prompter", "mask_token", "cls_token",
                   "cls_head_finetune", "bnorm"]:
        assert needle in joined, f"missing {needle}"
    # stacked backbone params cover all `depth` blocks
    flat_map = {"/".join(str(k) for k in path): v for path, v in flat}
    qkv = [v for k, v in flat_map.items() if "attn_qkv_kernel" in k
           and "MAE_decoder" not in k][0]
    assert qkv.shape[0] == 4  # depth
    # per-path stacks sized by their prompt/adapter depths
    dp = [v for k, v in flat_map.items() if "downstream_prompts" in k][0]
    assert dp.shape[0] == 2   # downstream_prompts_depth


def test_pretask_model_train_and_eval():
    cfg = small_model_cfg("Point_MAE_pretask_dev", with_downstream=False)
    model = build_model_from_cfg(cfg)
    point_num = 128
    pts = _pts(2, point_num + 20, 3)
    variables = model.init(RNGS, pts, point_num=point_num,
                           train_with_gaussian=True, deterministic=False)
    out, _ = model.apply(variables, pts, point_num=point_num,
                         train_with_gaussian=True, deterministic=False,
                         rngs=RNGS, mutable=["batch_stats"])
    predict_center, rebuild, noise_loss, recall = out
    assert predict_center.shape == (2, 8, 3)       # num_group - vis_num
    assert rebuild.shape == (2, 8 * cfg.group_size, 3)
    assert np.isfinite(float(noise_loss))
    assert 0.0 <= float(recall) <= 1.0
    # eval: no rectify branch
    pc, rb = model.apply(variables, pts, point_num=point_num,
                         train_with_gaussian=False, deterministic=True)
    assert pc.shape == (2, 8, 3)


def test_point_mae_pretraining_loss():
    cfg = small_model_cfg("Point_MAE", with_downstream=False)
    model = build_model_from_cfg(cfg)
    pts = _pts(2, 256, 4)
    variables = model.init(RNGS, pts, deterministic=False)
    loss, _ = model.apply(variables, pts, deterministic=False, rngs=RNGS,
                          mutable=["batch_stats"])
    assert np.isfinite(float(loss))
    feats = model.apply(variables, pts, eval_features=True, deterministic=True)
    assert feats.shape == (2, 48)


def test_unify_seg_forward():
    cfg = small_model_cfg("Point_MAE_unify_seg", cls_dim=50)
    cfg.prompt_propagation_after = False
    model = build_model_from_cfg(cfg)
    point_num = 160
    pts = _pts(2, point_num + 16, 5)
    label_points = _pts(2, 300, 6)
    one_hot = jnp.zeros((2, 16)).at[:, 3].set(1.0)
    variables = model.init(RNGS, pts, one_hot, label_points,
                           completion_prompt=True, denoise=True,
                           point_num=point_num, deterministic=True)
    logp = model.apply(variables, pts, one_hot, label_points,
                       completion_prompt=True, denoise=True,
                       point_num=point_num, deterministic=True)
    assert logp.shape == (2, 300, 50)
    np.testing.assert_allclose(np.exp(np.asarray(logp)).sum(-1), 1.0, rtol=1e-3)


def test_point_transformer_seg_forward():
    cfg = small_model_cfg("PointTransformer_seg", cls_dim=50, with_downstream=False)
    model = build_model_from_cfg(cfg)
    pts = _pts(2, 256, 7)
    one_hot = jnp.zeros((2, 16)).at[:, 0].set(1.0)
    variables = model.init(RNGS, pts, one_hot, deterministic=True)
    logp = model.apply(variables, pts, one_hot, deterministic=True)
    assert logp.shape == (2, 256, 50)


def test_pointr_forward():
    from upp_tpu.utils.config import ConfigDict
    cfg = ConfigDict.from_nested({
        "NAME": "PoinTr", "trans_dim": 48, "num_pred": 896,
        "num_query": 224, "knn_layer": 1, "num_points": 512,
    })
    model = build_model_from_cfg(cfg)
    pts = _pts(2, 300, 20)
    variables = model.init(RNGS, pts, deterministic=True)
    coarse, rebuild = model.apply(variables, pts, deterministic=True)
    # coarse: num_query predicted + num_query fps'd input
    assert coarse.shape == (2, 448, 3)
    # rebuild: num_query*fold_step^2 + input
    assert rebuild.shape == (2, 224 * 4 + 300, 3)
    assert np.isfinite(np.asarray(rebuild)).all()
    l1, l2 = model.get_loss((coarse, rebuild), pts)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))


def test_adapointr_train_and_eval():
    from upp_tpu.utils.config import ConfigDict
    cfg = ConfigDict.from_nested({
        "NAME": "AdaPoinTr", "num_query": 64, "num_points": 256,
        "decoder_type": "fc",
        "encoder_config": {"embed_dim": 48, "depth": 2},
        "decoder_config": {"embed_dim": 48, "depth": 2},
    })
    model = build_model_from_cfg(cfg)
    pts = _pts(2, 300, 30)
    rngs = dict(RNGS)
    rngs["denoise"] = jax.random.key(9)
    variables = model.init(rngs, pts, deterministic=False)
    out, _ = model.apply(variables, pts, deterministic=False, rngs=rngs,
                         mutable=["batch_stats"])
    pred_coarse, den_coarse, den_fine, pred_fine = out
    assert pred_coarse.shape == (2, 64, 3)
    assert pred_fine.shape == (2, 64 * 4, 3)   # factor = 256//64
    loss_d, loss_r = model.apply(variables, out, pts, method="get_loss")
    assert np.isfinite(float(loss_d)) and np.isfinite(float(loss_r))
    coarse, rebuild = model.apply(variables, pts, deterministic=True)
    assert coarse.shape == (2, 64, 3)
    assert rebuild.shape == (2, 256, 3)


def test_pretask_legacy_model():
    cfg = small_model_cfg("Point_MAE_pretask", with_downstream=False)
    model = build_model_from_cfg(cfg)
    point_num = 128
    pts = _pts(2, point_num + 20, 40)
    variables = model.init(RNGS, pts, point_num=point_num,
                           train_with_gaussian=True, deterministic=False)
    out, _ = model.apply(variables, pts, point_num=point_num,
                         train_with_gaussian=True, deterministic=False,
                         rngs=RNGS, mutable=["batch_stats"])
    predict_center, rebuild, noise_loss, recall = out
    assert predict_center.shape == (2, 8, 3)
    assert np.isfinite(float(noise_loss))
    pc, rb = model.apply(variables, pts, point_num=point_num,
                         train_with_gaussian=False, deterministic=True)
    assert rb.shape[-1] == 3


def test_torch_batchnorm_running_stats_semantics():
    """layers.TorchBatchNorm must track torch BatchNorm1d exactly over a
    sequence of train-mode steps: torch folds the UNBIASED batch variance
    into the running average (factor n/(n-1)); normalisation uses the biased
    one. flax's nn.BatchNorm gets this wrong (biased running update)."""
    import torch as _torch
    import numpy as _np
    from upp_tpu.models.layers import TorchBatchNorm

    C, steps = 6, 5
    rng = _np.random.default_rng(0)
    tbn = _torch.nn.BatchNorm1d(C, momentum=0.1, eps=1e-5)
    with _torch.no_grad():
        tbn.weight.copy_(_torch.from_numpy(
            rng.uniform(0.5, 1.5, C).astype(_np.float32)))
        tbn.bias.copy_(_torch.from_numpy(
            rng.uniform(-0.5, 0.5, C).astype(_np.float32)))

    fbn = TorchBatchNorm(use_running_average=False, momentum=0.9)
    variables = fbn.init(jax.random.key(0), jnp.zeros((4, C)))
    variables = dict(variables)
    variables["params"] = {
        "scale": jnp.asarray(tbn.weight.detach().numpy()),
        "bias": jnp.asarray(tbn.bias.detach().numpy())}
    stats = variables["batch_stats"]

    tbn.train()
    for s in range(steps):
        x = rng.standard_normal((16, C)).astype(_np.float32) * (s + 1)
        with _torch.no_grad():
            t_y = tbn(_torch.from_numpy(x)).numpy()
        f_y, mut = fbn.apply({"params": variables["params"],
                              "batch_stats": stats},
                             jnp.asarray(x), mutable=["batch_stats"])
        stats = mut["batch_stats"]
        np.testing.assert_allclose(np.asarray(f_y), t_y, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats["mean"]),
                               tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(stats["var"]),
                               tbn.running_var.numpy(), rtol=1e-5, atol=1e-6)
    # eval mode consumes the accumulated running stats identically
    tbn.eval()
    x = rng.standard_normal((8, C)).astype(_np.float32)
    with _torch.no_grad():
        t_y = tbn(_torch.from_numpy(x)).numpy()
    f_y = TorchBatchNorm(use_running_average=True).apply(
        {"params": variables["params"], "batch_stats": stats}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(f_y), t_y, rtol=1e-5, atol=1e-5)


def test_scan_unroll_env_guard(monkeypatch):
    """UPP_SCAN_UNROLL: integer values are clamped to [1, depth] ('0' is the
    natural 'rolled' spelling, '99' clamps to full), while NON-integer
    values raise loudly at trace time (VERDICT r4 item 7 — a typo like
    'full' silently fell back to the default in a controlled-experiment
    knob)."""
    import pytest

    cfg = small_model_cfg("PointTransformer")
    model = build_model_from_cfg(cfg)
    pts = _pts()
    variables = model.init(RNGS, pts, deterministic=True)
    for val in ("0", "99"):
        monkeypatch.setenv("UPP_SCAN_UNROLL", val)
        jax.clear_caches()   # the env is read at trace time
        logits = model.apply(variables, pts, deterministic=True)
        assert np.isfinite(np.asarray(logits)).all(), val
    monkeypatch.setenv("UPP_SCAN_UNROLL", "auto")
    jax.clear_caches()
    with pytest.raises(ValueError, match="UPP_SCAN_UNROLL"):
        model.apply(variables, pts, deterministic=True)
