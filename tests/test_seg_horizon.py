"""LONG-HORIZON training-equivalence for the SEGMENTATION task: reference
torch ``Point_MAE_unify_seg`` vs UPP-TPU on identical synthetic part-labelled
clouds for 16 epochs, matching NLL-loss trajectories and final per-point
accuracy.

Completes the task triad (cls: ``test_train_horizon``, pretask:
``test_pretask_horizon``): locks the seg-specific trainables — label_conv
conditioning, the {3,7,11} feature taps + global max/avg pooling,
propagation_0 full-resolution upsample, the (row-split, see
``unify_seg._SplitDense``) seg head — and the NLL loss surface +
grad_norm_clip 10 + CosLR + BN semantics over a compounding horizon.

The run uses the CLEAN path (completion_prompt=False, denoise=False — the
reference's eval/noisy_train-off configuration): the completion front end's
FPS re-selection is the documented discrete-chaos source excluded from all
horizon tests; it is covered at tight tolerance by the end-to-end seg parity
test (``test_full_model_parity.py::test_unify_seg_full_model_parity``).

The backbone must stay 384-wide/depth-12: the reference hardcodes the
propagation/seg-head channel counts (``Point_MAE_unify_segment.py:420-425``)
and the {3,7,11} tap indices (``:582-590``). Small B/N keep the CPU cost down.

Reference: tools/runner_unify_seg.py:101-267 end-to-end.
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

from ref_torch import RefCfg, load_reference_seg, randomize_bn_stats
from test_full_model_parity import SEG_MODEL, _randomize_weights
from upp_tpu.models import build_model_from_cfg
from upp_tpu.train.optim import build_optimizer, peft_detect
from upp_tpu.train.runner_seg import SEG_PEFT_LIST, nll_seg_loss
from upp_tpu.train.torch_ckpt import load_into_variables, load_torch_state_dict
from upp_tpu.utils.config import ConfigDict

pytestmark = pytest.mark.slow

TINY_SEG = dict(SEG_MODEL)
TINY_SEG["num_group"] = 32          # downstream groups (backbone width fixed)
TINY_SEG["group_size"] = 8
TINY_SEG["transformer_config"] = dict(
    SEG_MODEL["transformer_config"], drop_path_rate=0.0)
TINY_SEG["drop_path_rate"] = 0.0

B, N, N_PARTS = 4, 512, 4
STEPS_PER_EPOCH, EPOCHS = 8, 16
LR, WD, CLIP, WARMUP = 1e-3, 0.05, 10.0, 3


def _timm_cos_lr(epoch):
    lr_min = warmup_init = 1e-6
    if epoch < WARMUP:
        return warmup_init + (LR - warmup_init) * epoch / WARMUP
    t = min(epoch / EPOCHS, 1.0)
    return lr_min + 0.5 * (LR - lr_min) * (1.0 + np.cos(np.pi * t))


def _make_data(seed=0):
    """Clouds whose part label is a geometric function (xy quadrant) shifted
    by the object class, so NLL is learnable by geometry + label_conv."""
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(EPOCHS * STEPS_PER_EPOCH + 1):   # +1 held-out eval batch
        pts = rng.standard_normal((B, N, 3)).astype(np.float32)
        cls = rng.integers(0, 16, B).astype(np.int64)
        one_hot = np.zeros((B, 16), np.float32)
        one_hot[np.arange(B), cls] = 1.0
        quad = (pts[..., 0] > 0).astype(np.int64) * 2 + (pts[..., 1] > 0)
        target = (quad + cls[:, None]) % 50
        batches.append((pts, one_hot, target))
    return batches[:-1], batches[-1]


def test_seg_16_epoch_training_equivalence(monkeypatch, tmp_path):
    train_batches, (e_pts, e_oh, e_tgt) = _make_data()

    # ---------------- torch reference side ---------------------------------
    ns = load_reference_seg()
    torch.manual_seed(0)
    tm = ns["Point_MAE_unify_seg"](RefCfg(TINY_SEG))
    _randomize_weights(tm, seed=13)
    randomize_bn_stats(tm, seed=14)
    for m in tm.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    path = str(tmp_path / "seg.pth")
    torch.save({"base_model": tm.state_dict()}, path)

    decay, no_decay = [], []
    for name, p in tm.named_parameters():
        (no_decay if len(p.shape) == 1 or name.endswith(".bias")
         or "token" in name else decay).append(p)
    opt = torch.optim.AdamW(
        [{"params": no_decay, "weight_decay": 0.0},
         {"params": decay, "weight_decay": WD}], lr=LR, weight_decay=WD)
    for name, p in tm.named_parameters():   # runner_unify_seg.py:143-153
        p.requires_grad_(peft_detect(name, SEG_PEFT_LIST))

    def t_forward(pts, one_hot):
        return tm(torch.from_numpy(pts), torch.from_numpy(one_hot),
                  label_points=torch.from_numpy(pts),
                  completion_prompt=False, denoise=False, point_num=N)

    t_epoch_losses = []
    for epoch in range(EPOCHS):
        lr = _timm_cos_lr(epoch)
        for gp in opt.param_groups:
            gp["lr"] = lr
        tm.train()
        losses = []
        for s in range(STEPS_PER_EPOCH):
            pts, one_hot, target = train_batches[epoch * STEPS_PER_EPOCH + s]
            logp = t_forward(pts, one_hot)
            loss = torch.nn.functional.nll_loss(
                logp.reshape(-1, 50), torch.from_numpy(target).reshape(-1))
            opt.zero_grad(set_to_none=True)
            loss.backward()
            torch.nn.utils.clip_grad_norm_(tm.parameters(), CLIP, norm_type=2)
            opt.step()
            losses.append(float(loss.detach()))
        t_epoch_losses.append(float(np.mean(losses)))
    tm.eval()
    with torch.no_grad():
        t_acc = float((t_forward(e_pts, e_oh).argmax(-1).numpy()
                       == e_tgt).mean() * 100)

    # ---------------- UPP-TPU side ------------------------------------------
    fm = build_model_from_cfg(ConfigDict.from_nested(TINY_SEG))
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2)}
    # init through the full noisy path so every torch param has a flax home
    variables = dict(fm.init(rngs, jnp.zeros((2, N, 3), jnp.float32),
                             jnp.zeros((2, 16), jnp.float32),
                             jnp.zeros((2, N, 3), jnp.float32),
                             completion_prompt=True, denoise=True,
                             point_num=N - 128, deterministic=True))
    variables.setdefault("batch_stats", {})
    variables, missing, unexpected = load_into_variables(
        variables, load_torch_state_dict(path))
    assert not missing and not unexpected, (missing[:5], unexpected[:5])

    monkeypatch.setattr(nn.Dropout, "__call__",
                        lambda self, x, deterministic=None, rng=None: x)
    from upp_tpu.models import scan_blocks
    monkeypatch.setattr(scan_blocks, "_dropout",
                        lambda x, rate, rng, deterministic, salt=0: x)

    config = ConfigDict.from_nested({
        "optimizer": {"type": "AdamW", "kwargs": {"lr": LR, "weight_decay": WD}},
        "scheduler": {"type": "CosLR", "kwargs": {"epochs": EPOCHS,
                                                  "initial_epochs": WARMUP}},
        "grad_norm_clip": CLIP,
    })
    tx, _, _ = build_optimizer(config, variables["params"],
                               steps_per_epoch=STEPS_PER_EPOCH,
                               peft_list=SEG_PEFT_LIST)

    def loss_fn(p, stats, pts, one_hot, target):
        logp, mut = fm.apply(
            {"params": p, "batch_stats": stats}, pts, one_hot,
            pts, completion_prompt=False, denoise=False, point_num=N,
            deterministic=False, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(9),
                  "droppath": jax.random.key(8)})
        return nll_seg_loss(logp, target), mut["batch_stats"]

    @jax.jit
    def step(p, stats, o, pts, one_hot, target):
        (loss, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, stats, pts, one_hot, target)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), stats, o, loss

    @jax.jit
    def eval_logp(p, stats, pts, one_hot):
        return fm.apply({"params": p, "batch_stats": stats}, pts, one_hot,
                        pts, completion_prompt=False, denoise=False,
                        point_num=N, deterministic=True)

    params, stats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)
    f_epoch_losses = []
    for epoch in range(EPOCHS):
        losses = []
        for s in range(STEPS_PER_EPOCH):
            pts, one_hot, target = train_batches[epoch * STEPS_PER_EPOCH + s]
            params, stats, opt_state, loss = step(
                params, stats, opt_state, jnp.asarray(pts),
                jnp.asarray(one_hot), jnp.asarray(target.astype(np.int32)))
            losses.append(float(loss))
        f_epoch_losses.append(float(np.mean(losses)))
    f_acc = float((np.argmax(np.asarray(
        eval_logp(params, stats, jnp.asarray(e_pts), jnp.asarray(e_oh))), -1)
        == e_tgt).mean() * 100)

    # ---------------- assertions -------------------------------------------
    t_arr, f_arr = np.asarray(t_epoch_losses), np.asarray(f_epoch_losses)
    print("\ntorch epoch losses:", np.round(t_arr, 4).tolist())
    print("flax  epoch losses:", np.round(f_arr, 4).tolist())
    print(f"final per-point acc: torch={t_acc:.2f}  upp-tpu={f_acc:.2f}")
    np.testing.assert_allclose(f_arr[:5], t_arr[:5], rtol=2e-2, atol=5e-3)
    rel = np.abs(f_arr - t_arr) / np.maximum(np.abs(t_arr), 1e-3)
    assert np.median(rel) < 0.025, (np.median(rel),)
    assert rel.max() < 0.08, (rel.max(), rel.argmax())
    assert t_arr[-1] < 0.75 * t_arr[0], (t_arr[0], t_arr[-1])
    assert abs(t_acc - f_acc) <= 2.0, (t_acc, f_acc)
