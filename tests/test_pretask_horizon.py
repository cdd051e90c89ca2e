"""LONG-HORIZON training-equivalence for the PRETASK (prompter-pretraining)
task: the reference torch ``Point_MAE_pretask_dev`` stack and UPP-TPU train on
the SAME synthetic partial/cropped clouds for 24 epochs — across the epoch-12
stage-2 trainability switch — and must produce matching Chamfer-loss
trajectories.

This is the pretask-path counterpart of ``test_train_horizon`` (which covers
the unify-cls task): it locks down, over a compounding horizon, the 3×CD-L1
loss surface (``tools/runner_pretask.py:217-225``), the stage-2
requires_grad flip with SURVIVING optimizer moments
(``tools/runner_pretask.py:283-296`` — the reference flips masks in-place so
Adam moments of still-trainable params persist; UPP-TPU's mask-stable AdamW
must reproduce that), timm-CosLR scheduling, BN running statistics, and the
no-decay/decay AdamW grouping on the pretask parameter tree.

Determinism contract (same as test_train_horizon): both sides disable every
dropout and use drop_path 0; BN runs in training mode. The horizon runs the
no-noise branch (``train_with_gaussian=False`` — a real reference mode:
``--noise`` off skips the rectify noise branch, ``runner_pretask.py:213-217``)
because the noise branch's hard top-k point drop is a discrete selection that
f32 drift flips chaotically across frameworks over long horizons. The
noise-ON branch (knn_points K=4 supervision → positive/negative MSE +
recall + hard drop, ``Point_MAE_pretask_dev.py:664-704``) is covered by the
single-forward parity test below at tight tolerance.

Reference: tools/runner_pretask.py:69-306 end-to-end.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ref_torch import (RefCfg, _ChamferL1, load_reference_models,
                       randomize_bn_stats)
from test_full_model_parity import _export, _randomize_weights
from upp_tpu.models import build_model_from_cfg
from upp_tpu.models.build import jit_init
from upp_tpu.ops.chamfer import chamfer_l1
from upp_tpu.train.optim import build_optimizer
from upp_tpu.train.runner_pretask import (PRETASK_PEFT_LIST,
                                          PRETASK_STAGE2_LIST)
from upp_tpu.train.torch_ckpt import load_into_variables, load_torch_state_dict
from upp_tpu.utils.config import ConfigDict

pytestmark = pytest.mark.slow

TINY_PT = {
    "NAME": "Point_MAE_pretask_dev",
    "transformer_config": {
        "mask_ratio": 0.5, "mask_type": "rand", "trans_dim": 48,
        "encoder_dims": 48, "depth": 3, "drop_path_rate": 0.0,
        "num_heads": 4, "decoder_depth": 2, "decoder_num_heads": 4},
    # num_group MUST stay 64: RectifyPrompter hardcodes a 32-center/16-nn SA
    # over the vis centers (Point_MAE_pretask_dev.py:487,609), so
    # vis_num = num_group·(1-mask_ratio) must be ≥ 32
    "group_size": 8, "num_group": 64,
    "prompter_config": {
        "rectify_adapter": True, "rectify_prompts": True,
        "rectify_prompts_num": 2, "rectify_prompts_depth": 2,
        "rectify_depth": 2,
        "pretask_adapter": True, "pretask_prompts": True,
        "pretask_prompts_num": 2, "pretask_prompts_depth": 3,
        "pretask_depth": 3},
    "gather_idx": True, "prompt_propagation_after": True,
}
POINT_NUM = 128          # npoints: partial size fed to the model
N_GT = 256               # full cloud; cropping = N_GT - POINT_NUM points
GAUSS_N, LIDAR_N = 20, 32   # runner_pretask.py:198,207
B, STEPS_PER_EPOCH, EPOCHS, STAGE2 = 8, 8, 24, 12
LR, WD, WARMUP = 1e-3, 0.05, 3


def _timm_cos_lr(epoch):
    """timm CosineLRScheduler semantics (builder.py:66-75), EPOCHS horizon."""
    lr_min = warmup_init = 1e-6
    if epoch < WARMUP:
        return warmup_init + (LR - warmup_init) * epoch / WARMUP
    t = min(epoch / EPOCHS, 1.0)
    return lr_min + 0.5 * (LR - lr_min) * (1.0 + np.cos(np.pi * t))


def _make_data(seed=0, n_batches=EPOCHS * STEPS_PER_EPOCH):
    """(partial, cropping, gt) triples: shape prototypes cropped by a random
    viewpoint half-space split — the deterministic, host-side analogue of
    ``misc.seprate_point_cloud`` (both frameworks receive identical arrays,
    so the crop generator itself is not under test here; ops/corrupt.py has
    its own oracle tests)."""
    rng = np.random.default_rng(seed)
    protos = rng.standard_normal((6, 1024, 3)).astype(np.float32)
    batches = []
    for _ in range(n_batches):
        partial = np.empty((B, POINT_NUM, 3), np.float32)
        cropping = np.empty((B, N_GT - POINT_NUM, 3), np.float32)
        gt = np.empty((B, N_GT, 3), np.float32)
        for i in range(B):
            c = rng.integers(0, 6)
            sel = rng.choice(1024, N_GT, replace=False)
            pts = protos[c, sel] + 0.02 * rng.standard_normal(
                (N_GT, 3)).astype(np.float32)
            view = rng.standard_normal(3).astype(np.float32)
            view /= np.linalg.norm(view)
            order = np.argsort(pts @ view)        # near → far from viewpoint
            partial[i] = pts[order[:POINT_NUM]]
            cropping[i] = pts[order[POINT_NUM:]]
            gt[i] = pts
        batches.append((partial, cropping, gt))
    return batches


def _torch_all_params_adamw(model):
    """builder.build_opti_sche grouping (constructed before the PEFT freeze,
    runner_pretask.py:108-123)."""
    decay, no_decay = [], []
    for name, p in model.named_parameters():
        if len(p.shape) == 1 or name.endswith(".bias") or "token" in name:
            no_decay.append(p)
        else:
            decay.append(p)
    return torch.optim.AdamW(
        [{"params": no_decay, "weight_decay": 0.0},
         {"params": decay, "weight_decay": WD}], lr=LR, weight_decay=WD)


def _build_pair(tmp_path, seed_w=5, seed_bn=6):
    """(torch model, flax model, loaded flax variables) identical weights."""
    ns = load_reference_models()
    torch.manual_seed(0)
    tm = ns["dev"]["Point_MAE_pretask_dev"](RefCfg(TINY_PT))
    _randomize_weights(tm, seed=seed_w)
    randomize_bn_stats(tm, seed=seed_bn)
    for m in tm.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    path = _export(tmp_path, tm)

    fm = build_model_from_cfg(ConfigDict.from_nested(TINY_PT))
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2)}
    # init through the noise-ON path so the rectify branch materializes
    variables = dict(jit_init(
        fm, rngs, jnp.zeros((2, POINT_NUM + GAUSS_N + LIDAR_N, 3)),
        point_num=POINT_NUM, train_with_gaussian=True, deterministic=False))
    variables.setdefault("batch_stats", {})
    variables, missing, unexpected = load_into_variables(
        variables, load_torch_state_dict(path))
    assert not missing and not unexpected, (missing[:5], unexpected[:5])
    return tm, fm, variables


def _patch_flax_dropout(monkeypatch):
    monkeypatch.setattr(nn.Dropout, "__call__",
                        lambda self, x, deterministic=None, rng=None: x)
    from upp_tpu.models import scan_blocks
    monkeypatch.setattr(scan_blocks, "_dropout",
                        lambda x, rate, rng, deterministic, salt=0: x)


def test_pretask_24_epoch_training_equivalence(monkeypatch, tmp_path):
    batches = _make_data()
    cd_torch = _ChamferL1()

    # ---------------- torch reference side ---------------------------------
    tm, fm, variables = _build_pair(tmp_path)
    opt = _torch_all_params_adamw(tm)

    def torch_freeze(peft_list):
        from upp_tpu.train.optim import peft_detect
        for name, p in tm.named_parameters():
            p.requires_grad_(peft_detect(name, peft_list))

    torch_freeze(PRETASK_PEFT_LIST)
    t_epoch_losses = []
    for epoch in range(EPOCHS):
        if epoch == STAGE2:
            torch_freeze(PRETASK_STAGE2_LIST)   # runner_pretask.py:283-296
        lr = _timm_cos_lr(epoch)
        for g in opt.param_groups:
            g["lr"] = lr
        tm.train()
        losses = []
        for s in range(STEPS_PER_EPOCH):
            partial, cropping, gt = batches[epoch * STEPS_PER_EPOCH + s]
            center, rebuild = tm(torch.from_numpy(partial),
                                 point_num=POINT_NUM,
                                 train_with_gaussian=False,
                                 predict_center_num=16)
            loss = (cd_torch(center, torch.from_numpy(cropping))
                    + cd_torch(rebuild, torch.from_numpy(cropping))
                    + cd_torch(torch.cat([torch.from_numpy(partial), rebuild],
                                         dim=1), torch.from_numpy(gt)))
            opt.zero_grad(set_to_none=True)
            loss.backward()
            opt.step()
            losses.append(float(loss))
        t_epoch_losses.append(float(np.mean(losses)))

    # ---------------- UPP-TPU side ------------------------------------------
    _patch_flax_dropout(monkeypatch)
    config = ConfigDict.from_nested({
        "optimizer": {"type": "AdamW", "kwargs": {"lr": LR, "weight_decay": WD}},
        "scheduler": {"type": "CosLR", "kwargs": {"epochs": EPOCHS,
                                                  "initial_epochs": WARMUP}},
    })
    tx, _, _ = build_optimizer(config, variables["params"],
                               steps_per_epoch=STEPS_PER_EPOCH,
                               peft_list=PRETASK_PEFT_LIST)

    def make_step(tx):
        def loss_fn(p, stats, partial, cropping, gt):
            (center, rebuild), mut = fm.apply(
                {"params": p, "batch_stats": stats}, partial,
                point_num=POINT_NUM, train_with_gaussian=False,
                deterministic=False, mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(9),
                      "droppath": jax.random.key(8)})
            loss = (chamfer_l1(center, cropping)
                    + chamfer_l1(rebuild, cropping)
                    + chamfer_l1(jnp.concatenate([partial, rebuild], 1), gt))
            return loss, mut["batch_stats"]

        @jax.jit
        def step(p, stats, o, partial, cropping, gt):
            (loss, stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p, stats, partial, cropping, gt)
            updates, o = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), stats, o, loss
        return step

    step = make_step(tx)
    params, stats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)
    f_epoch_losses = []
    for epoch in range(EPOCHS):
        if epoch == STAGE2:
            # mask swap, SAME opt_state: moments survive (optim.py docstring)
            tx, _, _ = build_optimizer(config, params,
                                       steps_per_epoch=STEPS_PER_EPOCH,
                                       peft_list=PRETASK_STAGE2_LIST)
            step = make_step(tx)
        losses = []
        for s in range(STEPS_PER_EPOCH):
            partial, cropping, gt = batches[epoch * STEPS_PER_EPOCH + s]
            params, stats, opt_state, loss = step(
                params, stats, opt_state, jnp.asarray(partial),
                jnp.asarray(cropping), jnp.asarray(gt))
            losses.append(float(loss))
        f_epoch_losses.append(float(np.mean(losses)))

    # ---------------- assertions -------------------------------------------
    t_arr, f_arr = np.asarray(t_epoch_losses), np.asarray(f_epoch_losses)
    print("\ntorch epoch losses:", np.round(t_arr, 4).tolist())
    print("flax  epoch losses:", np.round(f_arr, 4).tolist())
    np.testing.assert_allclose(f_arr[:5], t_arr[:5], rtol=2e-2, atol=5e-3)
    rel = np.abs(f_arr - t_arr) / np.maximum(np.abs(t_arr), 1e-3)
    assert np.median(rel) < 0.025, (np.median(rel),)
    assert rel.max() < 0.08, (rel.max(), rel.argmax())
    # the prompters actually learn the completion task
    assert t_arr[-1] < 0.7 * t_arr[0], (t_arr[0], t_arr[-1])
    # the stage-2 switch didn't destabilize either side
    assert f_arr[STAGE2 + 1] < 1.15 * f_arr[STAGE2 - 1]


def test_pretask_noise_branch_forward_parity(monkeypatch, tmp_path):
    """Single train-mode forward of the noise-ON branch: knn_points(K=4)
    noise-vector supervision → positive/negative MSE + recall + hard drop
    (``Point_MAE_pretask_dev.py:664-704``).

    Asserted at the LOSS level, not pointwise: the branch contains two
    discrete selections (the k-NN neighbour sets inside the rectify
    prompter's interpolations and the hard top-(P-point_num) drop), and a
    single near-tie flip — the same sensitivity two torch runs on different
    BLAS backends show — moves individual output points while leaving every
    loss aggregate at the f32 level. recall is a count over P-point_num
    points, so one membership flip shifts it by 1/(B·(P-point_num))."""
    tm, fm, variables = _build_pair(tmp_path, seed_w=11, seed_bn=12)
    _patch_flax_dropout(monkeypatch)
    cd_torch = _ChamferL1()

    rng = np.random.default_rng(3)
    partial = rng.standard_normal((B, POINT_NUM, 3)).astype(np.float32)
    g = rng.normal(0.0, 0.2, (B, GAUSS_N, 3)).astype(np.float32)
    l = rng.standard_normal((B, LIDAR_N, 3)).astype(np.float32) * 1.4
    pts = np.concatenate([partial, g, l], axis=1)
    # fixed completion targets for the CD aggregates
    cropping = rng.standard_normal((B, N_GT - POINT_NUM, 3)).astype(np.float32)
    gt = np.concatenate([partial, cropping], axis=1)

    tm.train()
    with torch.no_grad():
        t_center, t_rebuild, t_nl, t_recall = tm(
            torch.from_numpy(pts), point_num=POINT_NUM,
            train_with_gaussian=True, predict_center_num=16)
        t_cd = (float(cd_torch(t_center, torch.from_numpy(cropping)))
                + float(cd_torch(t_rebuild, torch.from_numpy(cropping)))
                + float(cd_torch(torch.cat([torch.from_numpy(partial),
                                            t_rebuild], dim=1),
                                 torch.from_numpy(gt))))

    (f_center, f_rebuild, f_nl, f_recall), _ = fm.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(pts), point_num=POINT_NUM, train_with_gaussian=True,
        deterministic=False, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(9), "droppath": jax.random.key(8)})
    f_cd = (float(chamfer_l1(f_center, jnp.asarray(cropping)))
            + float(chamfer_l1(f_rebuild, jnp.asarray(cropping)))
            + float(chamfer_l1(jnp.concatenate(
                [jnp.asarray(partial), f_rebuild], 1), jnp.asarray(gt))))

    np.testing.assert_allclose(float(f_nl), float(t_nl), rtol=1e-2)
    np.testing.assert_allclose(float(f_recall), float(t_recall),
                               rtol=0.05, atol=0.02)
    np.testing.assert_allclose(f_cd, t_cd, rtol=1e-2)
    assert np.asarray(f_center).shape == tuple(t_center.shape)
    assert np.asarray(f_rebuild).shape == tuple(t_rebuild.shape)
