"""LONG-HORIZON training-equivalence for MAE PRETRAINING: the reference
torch ``Point_MAE`` (``models/Point_MAE_cp.py:369-465``) and UPP-TPU's
``PointMAE`` train on the SAME synthetic clouds with the SAME per-step mask
schedule for 24 epochs (192 compounding full-param AdamW steps) and must
produce matching loss trajectories and final eval-mode reconstruction loss.

Completes the horizon triad (cls: test_train_horizon, pretask:
test_pretask_horizon, seg: test_seg_horizon) for the fourth runner. What it
uniquely exercises beyond the short-step parity tests:

* the encoder BN statistics coupling — the reference encodes ALL groups and
  selects visible tokens AFTER (``Point_MAE_cp.py:352-357``), so masked
  groups participate in the train-mode BatchNorm batch statistics;
* full-param (non-PEFT) AdamW with decay grouping over every leaf, no grad
  clip (``tools/runner_pretrain.py:92,140-146`` — no clip in the pretrain
  loop), per-epoch timm CosLR;
* the torch→flax checkpoint shim for the `MAE_encoder.`-nested Point_MAE
  layout end-to-end (export a randomized reference model, load it, train).

Mask synchronisation: both frameworks' mask RNGs are unsyncable, so both
sides are driven from one precomputed per-step mask schedule — the torch
side by patching ``MAE_encoder._mask_center_rand``, the flax side by
patching ``PointMAE._rand_mask_idx`` to read (vis, mask) index arguments
threaded through the jitted step. Visible/masked index ORDER is the torch
boolean-mask order (ascending original index), which both sides honor.
Dropout/droppath are 0 in this config; BN is the only cross-step state.
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

from ref_torch import RefCfg, load_reference_mae, randomize_bn_stats
from test_full_model_parity import _export, _randomize_weights
from upp_tpu.models import baseline, build_model_from_cfg
from upp_tpu.models.build import jit_init
from upp_tpu.train.optim import build_optimizer
from upp_tpu.train.torch_ckpt import load_into_variables, load_torch_state_dict
from upp_tpu.utils.config import ConfigDict

pytestmark = pytest.mark.slow

TINY = {
    "NAME": "Point_MAE", "group_size": 8, "num_group": 16, "loss": "cdl2",
    "transformer_config": {
        "mask_ratio": 0.5, "mask_type": "rand", "trans_dim": 48,
        "encoder_dims": 48, "depth": 2, "drop_path_rate": 0.0,
        "num_heads": 4, "decoder_depth": 2, "decoder_num_heads": 4},
}
N_PTS, G, NUM_MASK = 128, 16, 8
B, STEPS_PER_EPOCH, EPOCHS = 8, 8, 24
LR, WD, WARMUP = 1e-3, 0.05, 3


def _timm_cos_lr(epoch):
    """timm CosineLRScheduler semantics as in builder.py:66-75 (see
    test_train_horizon._timm_cos_lr)."""
    lr_min = warmup_init = 1e-6
    if epoch < WARMUP:
        return warmup_init + (LR - warmup_init) * epoch / WARMUP
    t = min(epoch / EPOCHS, 1.0)
    return lr_min + 0.5 * (LR - lr_min) * (1.0 + np.cos(np.pi * t))


def _make_data(seed=0):
    """Shape-bearing clouds (3 lobes + jitter) so reconstruction is learnable."""
    rng = np.random.default_rng(seed)

    def sample(n):
        centers = rng.standard_normal((n, 4, 3)).astype(np.float32)
        lobe = rng.integers(0, 4, (n, N_PTS))
        pts = (np.take_along_axis(centers, lobe[..., None], axis=1)
               + 0.15 * rng.standard_normal((n, N_PTS, 3))).astype(np.float32)
        return pts

    train = [sample(B) for _ in range(EPOCHS * STEPS_PER_EPOCH)]
    return train, sample(B)


def _make_masks(n_steps, seed=123):
    """Per-step bool masks [B, G] with exactly NUM_MASK ones per row, plus
    the (vis, mask) index form in torch boolean-select order (ascending)."""
    rng = np.random.default_rng(seed)
    bools, vis_idx, mask_idx = [], [], []
    for _ in range(n_steps):
        m = np.zeros((B, G), bool)
        for i in range(B):
            m[i, rng.choice(G, NUM_MASK, replace=False)] = True
        bools.append(m)
        vis_idx.append(np.stack([np.where(~m[i])[0] for i in range(B)]))
        mask_idx.append(np.stack([np.where(m[i])[0] for i in range(B)]))
    return bools, np.asarray(vis_idx, np.int32), np.asarray(mask_idx, np.int32)


def _torch_adamw(model):
    decay, no_decay = [], []
    for name, p in model.named_parameters():
        if len(p.shape) == 1 or name.endswith(".bias") or "token" in name:
            no_decay.append(p)
        else:
            decay.append(p)
    return torch.optim.AdamW(
        [{"params": no_decay, "weight_decay": 0.0},
         {"params": decay, "weight_decay": WD}], lr=LR, weight_decay=WD)


def _build_flax_from(tmp_path, torch_model):
    path = _export(tmp_path, torch_model)
    fm = build_model_from_cfg(ConfigDict.from_nested(TINY))
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2), "mask": jax.random.key(3)}
    variables = dict(jit_init(fm, rngs, jnp.zeros((2, N_PTS, 3), jnp.float32),
                              deterministic=False))
    variables.setdefault("batch_stats", {})
    variables, missing, unexpected = load_into_variables(
        variables, load_torch_state_dict(path))
    assert not missing and not unexpected, (missing[:5], unexpected[:5])
    return fm, variables


def test_24_epoch_pretrain_equivalence(monkeypatch, tmp_path):
    train_batches, eval_pts = _make_data()
    n_steps = EPOCHS * STEPS_PER_EPOCH
    mask_bools, vis_all, mask_all = _make_masks(n_steps + 1)  # +1 for eval

    # ---------------- torch reference side ----------------------------------
    ns = load_reference_mae()
    torch.manual_seed(0)
    tm = ns["Point_MAE"](RefCfg(TINY))
    _randomize_weights(tm, seed=3)
    randomize_bn_stats(tm, seed=4)

    cursor = {"i": n_steps}  # eval slot by default; set per step below

    def fixed_mask(center, noaug=False):
        return torch.from_numpy(mask_bools[cursor["i"]])

    tm.MAE_encoder._mask_center_rand = fixed_mask
    opt = _torch_adamw(tm)

    def torch_eval_loss():
        cursor["i"] = n_steps
        tm.eval()
        with torch.no_grad():
            return float(tm(torch.from_numpy(eval_pts)))

    t_epoch_losses = []
    for epoch in range(EPOCHS):
        lr = _timm_cos_lr(epoch)
        for gparam in opt.param_groups:
            gparam["lr"] = lr
        tm.train()
        losses = []
        for s in range(STEPS_PER_EPOCH):
            step_i = epoch * STEPS_PER_EPOCH + s
            cursor["i"] = step_i
            loss = tm(torch.from_numpy(train_batches[step_i]))
            opt.zero_grad(set_to_none=True)
            loss.backward()
            opt.step()
            losses.append(float(loss))
        t_epoch_losses.append(float(np.mean(losses)))
    t_eval = torch_eval_loss()

    # ---------------- UPP-TPU side -------------------------------------------
    torch.manual_seed(0)
    tm2 = ns["Point_MAE"](RefCfg(TINY))
    _randomize_weights(tm2, seed=3)
    randomize_bn_stats(tm2, seed=4)
    fm, variables = _build_flax_from(tmp_path, tm2)

    holder = {}
    monkeypatch.setattr(baseline.PointMAE, "_rand_mask_idx",
                        lambda self, b: (holder["vis"], holder["mask"]))

    config = ConfigDict.from_nested({
        "optimizer": {"type": "AdamW", "kwargs": {"lr": LR, "weight_decay": WD}},
        "scheduler": {"type": "CosLR", "kwargs": {"epochs": EPOCHS,
                                                  "initial_epochs": WARMUP}},
    })
    tx, _, _ = build_optimizer(config, variables["params"],
                               steps_per_epoch=STEPS_PER_EPOCH, peft_list=None)

    def loss_fn(p, stats, pts, vis, mask):
        holder["vis"], holder["mask"] = vis, mask
        loss, mut = fm.apply({"params": p, "batch_stats": stats}, pts,
                             deterministic=False, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.key(9),
                                   "droppath": jax.random.key(8)})
        return loss, mut["batch_stats"]

    @jax.jit
    def step(p, stats, o, pts, vis, mask):
        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, stats, pts, vis, mask)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), stats, o, loss

    @jax.jit
    def eval_loss(p, stats, pts, vis, mask):
        holder["vis"], holder["mask"] = vis, mask
        return fm.apply({"params": p, "batch_stats": stats}, pts,
                        deterministic=True)

    params, stats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)
    f_epoch_losses = []
    for epoch in range(EPOCHS):
        losses = []
        for s in range(STEPS_PER_EPOCH):
            step_i = epoch * STEPS_PER_EPOCH + s
            params, stats, opt_state, loss = step(
                params, stats, opt_state,
                jnp.asarray(train_batches[step_i]),
                jnp.asarray(vis_all[step_i]), jnp.asarray(mask_all[step_i]))
            losses.append(float(loss))
        f_epoch_losses.append(float(np.mean(losses)))
    f_eval = float(eval_loss(params, stats, jnp.asarray(eval_pts),
                             jnp.asarray(vis_all[n_steps]),
                             jnp.asarray(mask_all[n_steps])))

    # ---------------- assertions --------------------------------------------
    t_arr, f_arr = np.asarray(t_epoch_losses), np.asarray(f_epoch_losses)
    print("\ntorch epoch losses:", np.round(t_arr, 5).tolist())
    print("flax  epoch losses:", np.round(f_arr, 5).tolist())
    print(f"final eval CD-L2: torch={t_eval:.6f}  upp-tpu={f_eval:.6f}")
    np.testing.assert_allclose(f_arr[:5], t_arr[:5], rtol=2e-2, atol=5e-4)
    rel = np.abs(f_arr - t_arr) / np.maximum(np.abs(t_arr), 1e-4)
    assert np.median(rel) < 0.025, (np.median(rel),)
    assert rel.max() < 0.08, (rel.max(), rel.argmax())
    assert t_arr[-1] < 0.6 * t_arr[0]          # it actually learns
    assert abs(t_eval - f_eval) / t_eval < 0.05, (t_eval, f_eval)


def test_pretrain_forward_parity(monkeypatch, tmp_path):
    """Single fixed-mask forward: train-mode loss (batch-stat BN incl. the
    all-groups encoder coupling) and eval-features output match torch to f32
    tolerance."""
    ns = load_reference_mae()
    torch.manual_seed(0)
    tm = ns["Point_MAE"](RefCfg(TINY))
    _randomize_weights(tm, seed=3)
    randomize_bn_stats(tm, seed=4)
    fm, variables = _build_flax_from(tmp_path, tm)
    params = jax.tree_util.tree_map(jnp.asarray, variables["params"])
    stats = jax.tree_util.tree_map(jnp.asarray, variables["batch_stats"])

    mask_bools, vis_all, mask_all = _make_masks(1)
    tm.MAE_encoder._mask_center_rand = (
        lambda center, noaug=False: torch.from_numpy(mask_bools[0]))

    pts = _make_data(seed=5)[1]

    # eval features FIRST (a torch train-mode forward updates BN running
    # stats even under no_grad, which would shift this comparison).
    # SVM probe path vs reference eval branch semantics: encoder tokens ->
    # blocks -> norm -> max over tokens. The reference eval branch calls
    # .cuda() on a CPU tensor (Point_MAE_cp.py:344) so it cannot run under
    # the stubs; assert against a hand-run of the same eval pipeline through
    # the torch modules instead.
    tm.eval()
    with torch.no_grad():
        neigh, center = tm.group_divider(torch.from_numpy(pts))
        x = tm.MAE_encoder.encoder(neigh)
        pos = tm.MAE_encoder.pos_embed(center)
        for blk in tm.MAE_encoder.blocks.blocks:
            x = blk(x + pos)
        t_feat = tm.MAE_encoder.norm(x).max(dim=1).values.numpy()
    f_feat = np.asarray(fm.apply({"params": params, "batch_stats": stats},
                                 jnp.asarray(pts), eval_features=True,
                                 deterministic=True))
    np.testing.assert_allclose(f_feat, t_feat, rtol=1e-2, atol=5e-3)

    tm.train()
    with torch.no_grad():
        t_loss = float(tm(torch.from_numpy(pts)))
    holder = {}
    monkeypatch.setattr(baseline.PointMAE, "_rand_mask_idx",
                        lambda self, b: (holder["vis"], holder["mask"]))
    holder["vis"] = jnp.asarray(vis_all[0])
    holder["mask"] = jnp.asarray(mask_all[0])
    f_loss, _ = fm.apply({"params": params, "batch_stats": stats},
                         jnp.asarray(pts), deterministic=False,
                         mutable=["batch_stats"],
                         rngs={"dropout": jax.random.key(9),
                               "droppath": jax.random.key(8)})
    np.testing.assert_allclose(float(f_loss), t_loss, rtol=1e-4, atol=1e-6)


# --------------------------------------------------------- full-FT baseline

TINY_PT = {
    "NAME": "PointTransformer", "trans_dim": 48, "depth": 2,
    "drop_path_rate": 0.0, "cls_dim": 4, "num_heads": 4,
    "group_size": 8, "num_group": 16, "encoder_dims": 48,
}
PT_EPOCHS = 16


def _cls_data(seed=11):
    """Learnable 4-class clouds (per-class prototype + jitter)."""
    rng = np.random.default_rng(seed)
    protos = rng.standard_normal((4, 512, 3)).astype(np.float32)

    def sample(n):
        labels = rng.integers(0, 4, n)
        pts = np.empty((n, N_PTS, 3), np.float32)
        for i, c in enumerate(labels):
            sel = rng.choice(512, N_PTS, replace=False)
            pts[i] = protos[c, sel] + 0.02 * rng.standard_normal(
                (N_PTS, 3)).astype(np.float32)
        return pts, labels.astype(np.int64)

    train = [sample(B) for _ in range(PT_EPOCHS * STEPS_PER_EPOCH)]
    return train, sample(64)


def _build_pt_pair(monkeypatch, tmp_path):
    import torch.nn as tnn
    from flax import linen as fnn

    ns = load_reference_mae()
    torch.manual_seed(0)
    tm = ns["PointTransformer"](RefCfg(TINY_PT))
    _randomize_weights(tm, seed=3)
    randomize_bn_stats(tm, seed=4)
    for m in tm.modules():            # dropout RNGs can't be synchronised
        if isinstance(m, tnn.Dropout):
            m.p = 0.0

    path = _export(tmp_path, tm)
    fm = build_model_from_cfg(ConfigDict.from_nested(TINY_PT))
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2)}
    variables = dict(jit_init(fm, rngs, jnp.zeros((2, N_PTS, 3), jnp.float32),
                              deterministic=True))
    variables.setdefault("batch_stats", {})
    variables, missing, unexpected = load_into_variables(
        variables, load_torch_state_dict(path))
    assert not missing and not unexpected, (missing[:5], unexpected[:5])

    monkeypatch.setattr(fnn.Dropout, "__call__",
                        lambda self, x, deterministic=None, rng=None: x)
    from upp_tpu.models import scan_blocks
    monkeypatch.setattr(scan_blocks, "_dropout",
                        lambda x, rate, rng, deterministic, salt=0: x)
    return tm, fm, variables


def test_pointtransformer_forward_parity(monkeypatch, tmp_path):
    """Full-FT baseline (M15): eval- and train-mode logits match torch
    through the ckpt shim — the plain block stacks' param tree must be
    exactly the reference ViT's."""
    tm, fm, variables = _build_pt_pair(monkeypatch, tmp_path)
    params = jax.tree_util.tree_map(jnp.asarray, variables["params"])
    stats = jax.tree_util.tree_map(jnp.asarray, variables["batch_stats"])
    pts = _cls_data()[1][0][:8]

    tm.eval()
    with torch.no_grad():
        t_out = tm(torch.from_numpy(pts)).numpy()
    f_out = np.asarray(fm.apply({"params": params, "batch_stats": stats},
                                jnp.asarray(pts), deterministic=True))
    np.testing.assert_allclose(f_out, t_out, rtol=1e-3, atol=5e-4)

    tm.train()
    with torch.no_grad():
        t_out = tm(torch.from_numpy(pts)).numpy()
    f_out, _ = fm.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(pts), deterministic=False,
                        mutable=["batch_stats"],
                        rngs={"dropout": jax.random.key(9),
                              "droppath": jax.random.key(8)})
    np.testing.assert_allclose(np.asarray(f_out), t_out, rtol=1e-3, atol=5e-3)


def test_16_epoch_finetune_equivalence(monkeypatch, tmp_path):
    """FULL fine-tuning horizon (the --finetune_model path, runner_finetune):
    every param trainable, CE loss, clip 10, per-epoch timm CosLR — torch and
    UPP-TPU loss curves must track and final eval accuracy must match."""
    import optax

    CLIP = 10.0
    FT_LR = 5e-4    # the finetune configs' LR; full-FT at 1e-3 amplifies f32
                    # drift chaotically (every param trains, FPS picks flip)
    train_batches, (eval_pts, eval_lab) = _cls_data()
    tm, fm, variables = _build_pt_pair(monkeypatch, tmp_path)
    opt = _torch_adamw(tm)

    def timm_lr(epoch):
        lr_min = warmup_init = 1e-6
        if epoch < WARMUP:
            return warmup_init + (FT_LR - warmup_init) * epoch / WARMUP
        t = min(epoch / PT_EPOCHS, 1.0)
        return lr_min + 0.5 * (FT_LR - lr_min) * (1.0 + np.cos(np.pi * t))

    t_losses = []
    for epoch in range(PT_EPOCHS):
        for g in opt.param_groups:
            g["lr"] = timm_lr(epoch)
        tm.train()
        ep = []
        for s in range(STEPS_PER_EPOCH):
            pts, lab = train_batches[epoch * STEPS_PER_EPOCH + s]
            loss = torch.nn.functional.cross_entropy(
                tm(torch.from_numpy(pts)), torch.from_numpy(lab))
            opt.zero_grad(set_to_none=True)
            loss.backward()
            torch.nn.utils.clip_grad_norm_(tm.parameters(), CLIP, norm_type=2)
            opt.step()
            ep.append(float(loss))
        t_losses.append(float(np.mean(ep)))
    tm.eval()
    with torch.no_grad():
        t_acc = float((tm(torch.from_numpy(eval_pts)).argmax(-1).numpy()
                       == eval_lab).mean() * 100)

    config = ConfigDict.from_nested({
        "optimizer": {"type": "AdamW", "kwargs": {"lr": FT_LR,
                                                  "weight_decay": WD}},
        "scheduler": {"type": "CosLR", "kwargs": {"epochs": PT_EPOCHS,
                                                  "initial_epochs": WARMUP}},
        "grad_norm_clip": CLIP,
    })
    tx, _, _ = build_optimizer(config, variables["params"],
                               steps_per_epoch=STEPS_PER_EPOCH, peft_list=None)

    def loss_fn(p, stats, pts, lab):
        logits, mut = fm.apply(
            {"params": p, "batch_stats": stats}, pts, deterministic=False,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(9), "droppath": jax.random.key(8)})
        return (optax.softmax_cross_entropy_with_integer_labels(
            logits, lab).mean(), mut["batch_stats"])

    @jax.jit
    def step(p, stats, o, pts, lab):
        (loss, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, stats, pts, lab)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), stats, o, loss

    params, stats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)
    f_losses = []
    for epoch in range(PT_EPOCHS):
        ep = []
        for s in range(STEPS_PER_EPOCH):
            pts, lab = train_batches[epoch * STEPS_PER_EPOCH + s]
            params, stats, opt_state, loss = step(
                params, stats, opt_state, jnp.asarray(pts),
                jnp.asarray(lab.astype(np.int32)))
            ep.append(float(loss))
        f_losses.append(float(np.mean(ep)))

    @jax.jit
    def eval_logits(p, stats, pts):
        return fm.apply({"params": p, "batch_stats": stats}, pts,
                        deterministic=True)

    f_acc = float((np.argmax(np.asarray(eval_logits(
        params, stats, jnp.asarray(eval_pts))), -1) == eval_lab).mean() * 100)

    t_arr, f_arr = np.asarray(t_losses), np.asarray(f_losses)
    print("\ntorch epoch losses:", np.round(t_arr, 4).tolist())
    print("flax  epoch losses:", np.round(f_arr, 4).tolist())
    print(f"final OA: torch={t_acc:.2f}  upp-tpu={f_acc:.2f}")
    # epochs 0-1 (16 compounding steps) are where semantics bugs surface at
    # the 1e-3 level (schedule off-by-one, decay grouping, BN update); from
    # epoch 2 full-FT drift is chaotic — EVERY param trains, so f32 noise
    # flips FPS picks and the CE-on-8-samples loss amplifies it in both
    # directions (measured: sign-alternating 3-7%; the smooth-loss MAE
    # horizon with the identical optimizer tracks to 2.5% median).
    np.testing.assert_allclose(f_arr[:2], t_arr[:2], rtol=5e-3, atol=2e-3)
    rel = np.abs(f_arr - t_arr) / np.maximum(np.abs(t_arr), 1e-3)
    assert np.median(rel) < 0.08, (np.median(rel),)
    assert rel.max() < 0.25, (rel.max(), rel.argmax())
    assert t_arr[-1] < 0.5 * t_arr[0]      # full FT learns fast
    assert f_arr[-1] < 0.5 * f_arr[0]
    assert abs(t_acc - f_acc) <= 5.0, (t_acc, f_acc)
