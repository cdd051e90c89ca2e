"""LONG-HORIZON training-equivalence: the reference torch stack and UPP-TPU
train the SAME tiny-flagship model on the SAME synthetic classification data
for 32 epochs (128 compounding optimizer steps) and must produce matching
loss trajectories and final accuracies.

This is the bridge between "numerics match" (test_full_model_parity /
test_train_parity, ≤3 steps) and "OA will match on real data": it exercises
everything that only surfaces over hundreds of steps — BN running-statistic
drift (torch folds the UNBIASED batch variance into the running average; see
layers.TorchBatchNorm), the per-epoch timm CosLR schedule incl. warmup
(builder.py:66-75), PEFT masking + decay grouping + global-norm clip + AdamW
moment accumulation (runner_module.py:62-73, builder.py:38-56).

Determinism contract: BOTH sides run BN in training mode (stats updating)
with every dropout disabled (torch: p=0 on all Dropout modules; flax:
Dropout patched to identity) and drop_path_rate=0 — the two frameworks'
dropout RNGs cannot be synchronised, and run-to-run dropout noise is exactly
the variance this test must exclude to make "curves track within f32 drift"
assertable. The run uses the completion-prompt path with denoise OFF:
enabling BOTH makes the final FPS re-select among near-duplicate candidates,
so a 1e-6 f32 difference flips discrete point choices (0.16 max logit diff
from one flip — the same sensitivity exists between two reference runs on
different hardware); each individual path matches to ~1e-3 in train mode
(asserted by test_train_mode_forward_parity). Everything else is the
production path on both sides.

Reference: tools/runner_module.py:88-272 (train loop semantics end-to-end).
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

from ref_torch import RefCfg, load_reference_models, randomize_bn_stats
from test_full_model_parity import _export, _randomize_weights
from upp_tpu.models import build_model_from_cfg
from upp_tpu.models.build import jit_init
from upp_tpu.train.optim import build_optimizer
from upp_tpu.train.runner_cls import PEFT_LIST
from upp_tpu.train.torch_ckpt import load_into_variables, load_torch_state_dict
from upp_tpu.utils.config import ConfigDict

pytestmark = pytest.mark.slow

TINY = {
    "NAME": "Point_MAE_unify",
    "transformer_config": {
        "mask_ratio": 0.5, "mask_type": "rand", "trans_dim": 48,
        "encoder_dims": 48, "depth": 2, "drop_path_rate": 0.0,
        "num_heads": 4, "decoder_depth": 2, "decoder_num_heads": 4},
    # num_group MUST stay 64: the reference anchors vis_num/coarse_pred to a
    # hardcoded 64 (Point_MAE_unify.py:404,433) regardless of num_group
    "cls_dim": 4, "group_size": 8, "num_group": 64,
    "prompter_config": {
        "rectify_adapter": True, "rectify_prompts": True,
        "rectify_prompts_num": 3, "rectify_prompts_depth": 2,
        "rectify_depth": 2,
        "pretask_adapter": True, "pretask_prompts": True,
        "pretask_prompts_num": 3, "pretask_prompts_depth": 2,
        "pretask_depth": 2,
        "downstream_adapter": True, "downstream_prompts": True,
        "downstream_prompts_num": 10, "downstream_prompts_depth": 2,
        "downstream_depth": 2},
    "gather_idx": False, "prompt_propagation_after": True,
}
POINT_NUM, NOISE_PTS, N_CLASSES = 128, 72, 4
B, STEPS_PER_EPOCH, EPOCHS = 8, 8, 32
LR, WD, CLIP, WARMUP = 1e-3, 0.05, 10.0, 3
N_EVAL = 256


def _timm_cos_lr(epoch):
    """timm CosineLRScheduler(t_initial=EPOCHS, lr_min=1e-6,
    warmup_lr_init=1e-6, warmup_t=WARMUP, t_in_epochs=True) stepped per epoch
    (builder.py:66-75; warmup_prefix=False → raw-epoch cosine index)."""
    lr_min = warmup_init = 1e-6
    if epoch < WARMUP:
        return warmup_init + (LR - warmup_init) * epoch / WARMUP
    t = min(epoch / EPOCHS, 1.0)
    return lr_min + 0.5 * (LR - lr_min) * (1.0 + np.cos(np.pi * t))


def _make_data(seed=0):
    """Learnable 4-class clouds: per-class prototype + jitter, with the +72
    ambient 'noise points' the completion path expects appended."""
    rng = np.random.default_rng(seed)
    protos = rng.standard_normal((N_CLASSES, 512, 3)).astype(np.float32)

    def sample(n):
        labels = rng.integers(0, N_CLASSES, n)
        pts = np.empty((n, POINT_NUM + NOISE_PTS, 3), np.float32)
        for i, c in enumerate(labels):
            sel = rng.choice(512, POINT_NUM, replace=False)
            body = protos[c, sel] + 0.02 * rng.standard_normal(
                (POINT_NUM, 3)).astype(np.float32)
            noise = 0.6 * rng.standard_normal((NOISE_PTS, 3)).astype(np.float32)
            pts[i] = np.concatenate([body, noise], 0)
        return pts, labels.astype(np.int64)

    train = [sample(B) for _ in range(EPOCHS * STEPS_PER_EPOCH)]
    eval_pts, eval_lab = sample(N_EVAL)
    return train, eval_pts, eval_lab


def _torch_all_params_adamw(model):
    """builder.build_opti_sche semantics: constructed BEFORE the PEFT freeze
    (runner_module.py:59 vs 68-73), so ALL params are in the groups."""
    decay, no_decay = [], []
    for name, p in model.named_parameters():
        if len(p.shape) == 1 or name.endswith(".bias") or "token" in name:
            no_decay.append(p)
        else:
            decay.append(p)
    return torch.optim.AdamW(
        [{"params": no_decay, "weight_decay": 0.0},
         {"params": decay, "weight_decay": WD}], lr=LR, weight_decay=WD)


def test_32_epoch_training_equivalence(monkeypatch, tmp_path):
    train_batches, eval_pts, eval_lab = _make_data()

    # ---------------- torch reference side ---------------------------------
    ns = load_reference_models()
    torch.manual_seed(0)
    tm = ns["unify"]["Point_MAE_unify"](RefCfg(TINY))
    _randomize_weights(tm, seed=3)
    randomize_bn_stats(tm, seed=4)
    for m in tm.modules():              # the only stochastic ops; see header
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0

    opt = _torch_all_params_adamw(tm)
    for name, p in tm.named_parameters():   # PEFT freeze AFTER build
        p.requires_grad_(any(t in name for t in PEFT_LIST))

    def torch_eval_acc():
        tm.eval()
        with torch.no_grad():
            preds = []
            for s in range(0, N_EVAL, 32):
                ret = tm(torch.from_numpy(eval_pts[s:s + 32]),
                         completion_prompt=True, denoise=False,
                         point_num=POINT_NUM)
                preds.append(ret.argmax(-1).numpy())
        return float((np.concatenate(preds) == eval_lab[:N_EVAL]).mean() * 100)

    t_epoch_losses = []
    for epoch in range(EPOCHS):
        lr = _timm_cos_lr(epoch)
        for g in opt.param_groups:
            g["lr"] = lr
        tm.train()
        losses = []
        for s in range(STEPS_PER_EPOCH):
            pts, lab = train_batches[epoch * STEPS_PER_EPOCH + s]
            ret = tm(torch.from_numpy(pts), completion_prompt=True,
                     denoise=False, point_num=POINT_NUM)
            loss = torch.nn.functional.cross_entropy(ret, torch.from_numpy(lab))
            opt.zero_grad(set_to_none=True)
            loss.backward()
            torch.nn.utils.clip_grad_norm_(tm.parameters(), CLIP, norm_type=2)
            opt.step()
            losses.append(float(loss))
        t_epoch_losses.append(float(np.mean(losses)))
    t_acc = torch_eval_acc()

    # ---------------- UPP-TPU side ------------------------------------------
    # identical start: re-init an identical torch model, export through the
    # production ckpt shim
    torch.manual_seed(0)
    tm2 = ns["unify"]["Point_MAE_unify"](RefCfg(TINY))
    _randomize_weights(tm2, seed=3)
    randomize_bn_stats(tm2, seed=4)
    path = _export(tmp_path, tm2)

    fm = build_model_from_cfg(ConfigDict.from_nested(TINY))
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2)}
    # init with denoise=True so EVERY torch param has a flax home (the run
    # itself uses denoise=False; the rectify params stay frozen on both sides)
    variables = dict(jit_init(fm, rngs,
                              jnp.zeros((2, POINT_NUM + NOISE_PTS, 3)),
                              completion_prompt=True, denoise=True,
                              point_num=POINT_NUM, deterministic=True))
    variables.setdefault("batch_stats", {})
    variables, missing, unexpected = load_into_variables(
        variables, load_torch_state_dict(path))
    assert not missing and not unexpected, (missing[:5], unexpected[:5])

    # dropout off (see header) — BN stays in training mode via deterministic=False
    monkeypatch.setattr(nn.Dropout, "__call__",
                        lambda self, x, deterministic=None, rng=None: x)
    from upp_tpu.models import scan_blocks
    monkeypatch.setattr(  # the scan stacks' raw-bernoulli adapter dropout
        scan_blocks, "_dropout",
        lambda x, rate, rng, deterministic, salt=0: x)

    config = ConfigDict.from_nested({
        "optimizer": {"type": "AdamW", "kwargs": {"lr": LR, "weight_decay": WD}},
        "scheduler": {"type": "CosLR", "kwargs": {"epochs": EPOCHS,
                                                  "initial_epochs": WARMUP}},
        "grad_norm_clip": CLIP,
    })
    tx, sched, _ = build_optimizer(config, variables["params"],
                                   steps_per_epoch=STEPS_PER_EPOCH,
                                   peft_list=PEFT_LIST)

    def loss_fn(p, stats, pts, lab):
        logits, mut = fm.apply(
            {"params": p, "batch_stats": stats}, pts,
            completion_prompt=True, denoise=False, point_num=POINT_NUM,
            deterministic=False, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(9), "droppath": jax.random.key(8)})
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, lab).mean()
        return loss, mut["batch_stats"]

    @jax.jit
    def step(p, stats, o, pts, lab):
        (loss, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, stats, pts, lab)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), stats, o, loss

    @jax.jit
    def eval_logits(p, stats, pts):
        return fm.apply({"params": p, "batch_stats": stats}, pts,
                        completion_prompt=True, denoise=False,
                        point_num=POINT_NUM, deterministic=True)

    params, stats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)
    f_epoch_losses = []
    for epoch in range(EPOCHS):
        losses = []
        for s in range(STEPS_PER_EPOCH):
            pts, lab = train_batches[epoch * STEPS_PER_EPOCH + s]
            params, stats, opt_state, loss = step(
                params, stats, opt_state, jnp.asarray(pts),
                jnp.asarray(lab.astype(np.int32)))
            losses.append(float(loss))
        f_epoch_losses.append(float(np.mean(losses)))
    preds = []
    for s in range(0, N_EVAL, 32):
        preds.append(np.argmax(np.asarray(
            eval_logits(params, stats, jnp.asarray(eval_pts[s:s + 32]))), -1))
    f_acc = float((np.concatenate(preds) == eval_lab[:N_EVAL]).mean() * 100)

    # ---------------- assertions -------------------------------------------
    t_arr, f_arr = np.asarray(t_epoch_losses), np.asarray(f_epoch_losses)
    print("\ntorch epoch losses:", np.round(t_arr, 4).tolist())
    print("flax  epoch losses:", np.round(f_arr, 4).tolist())
    print(f"final OA: torch={t_acc:.2f}  upp-tpu={f_acc:.2f}")
    # early epochs: tight f32 tracking (compounding not yet chaotic;
    # measured drift after 40 steps at lr 1e-3 is ~1%)
    np.testing.assert_allclose(f_arr[:5], t_arr[:5], rtol=2e-2, atol=5e-3)
    # whole run: the curves track within f32-drift amplification. A real
    # semantics bug (wrong BN update, dropped optimizer moments, schedule
    # off-by-one) compounds monotonically into tens of percent within a few
    # epochs (measured: the adapter-dropout mismatch alone hit 8.5% by epoch
    # 4 and kept growing); f32 drift oscillates at the ~1-3% level.
    rel = np.abs(f_arr - t_arr) / np.maximum(np.abs(t_arr), 1e-3)
    assert np.median(rel) < 0.025, (np.median(rel),)
    assert rel.max() < 0.08, (rel.max(), rel.argmax())
    # both learn (PEFT from random init is slow: ~35% loss drop over 128
    # steps with a 3-epoch warmup), and end within ±1% OA of each other
    assert t_arr[-1] < 0.75 * t_arr[0]
    assert abs(t_acc - f_acc) <= 1.0, (t_acc, f_acc)


def test_train_mode_forward_parity(monkeypatch, tmp_path):
    """Single train-mode forward (BN batch statistics) matches torch to f32
    tolerance on each path individually. The combined denoise+completion
    path is asserted only loosely: its final FPS re-selects among
    near-duplicate candidates, so f32 drift flips discrete point choices
    (documented in the module header)."""
    import tempfile

    ns = load_reference_models()
    torch.manual_seed(0)
    tm = ns["unify"]["Point_MAE_unify"](RefCfg(TINY))
    _randomize_weights(tm, seed=3)
    randomize_bn_stats(tm, seed=4)
    for m in tm.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0

    rng = np.random.default_rng(7)
    pts = rng.standard_normal((4, POINT_NUM + NOISE_PTS, 3)).astype(np.float32)

    path = _export(tmp_path, tm)
    fm = build_model_from_cfg(ConfigDict.from_nested(TINY))
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2)}
    variables = dict(jit_init(fm, rngs,
                              jnp.zeros((2, POINT_NUM + NOISE_PTS, 3)),
                              completion_prompt=True, denoise=True,
                              point_num=POINT_NUM, deterministic=True))
    variables.setdefault("batch_stats", {})
    variables, missing, unexpected = load_into_variables(
        variables, load_torch_state_dict(path))
    assert not missing and not unexpected
    params = jax.tree_util.tree_map(jnp.asarray, variables["params"])
    stats = jax.tree_util.tree_map(jnp.asarray, variables["batch_stats"])

    monkeypatch.setattr(nn.Dropout, "__call__",
                        lambda self, x, deterministic=None, rng=None: x)
    from upp_tpu.models import scan_blocks
    monkeypatch.setattr(scan_blocks, "_dropout",
                        lambda x, rate, rng, deterministic, salt=0: x)

    for cp, dn, tol in [(False, False, 5e-3), (True, False, 5e-3),
                        (False, True, 5e-3), (True, True, 1.0)]:
        tm.train()
        with torch.no_grad():
            t_out = tm(torch.from_numpy(pts), completion_prompt=cp,
                       denoise=dn, point_num=POINT_NUM).numpy()
        f_out, _ = fm.apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(pts),
            completion_prompt=cp, denoise=dn, point_num=POINT_NUM,
            deterministic=False, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(9), "droppath": jax.random.key(8)})
        diff = float(np.abs(np.asarray(f_out) - t_out).max())
        assert diff < tol, (cp, dn, diff)
