"""TRAINING-LOOP numeric parity: 3 PEFT AdamW steps of the reference torch
code vs our flax + optax stack, same weights (via the production ckpt shim),
same batch, deterministic forward (eval-mode dropout/droppath/BN so the two
RNG systems can't diverge the comparison).

Extends tests/test_full_model_parity.py (forward-only) to the full
optimize-loop: CE loss → backward over the PEFT subset → global-norm clip →
decay-grouped AdamW → updated params → next step's loss. Three compounding
steps make optimizer-semantics bugs (decay grouping, masking, clip, Adam
hyper-params) visible in the loss trajectory.

Reference: tools/runner_module.py:62-206 (PEFT freeze + train step),
tools/builder.py:38-56 (add_weight_decay AdamW groups),
models/Point_MAE_unify.py:499-503 (get_loss_acc).
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

from ref_torch import RefCfg, load_reference_models, randomize_bn_stats
from test_full_model_parity import FLAGSHIP, _randomize_weights, _export
from upp_tpu.models import build_model_from_cfg
from upp_tpu.models.build import jit_init
from upp_tpu.train.optim import build_optimizer
from upp_tpu.train.runner_cls import PEFT_LIST
from upp_tpu.train.torch_ckpt import load_into_variables, load_torch_state_dict
from upp_tpu.utils.config import ConfigDict

pytestmark = pytest.mark.slow  # full-scale model, ~minutes of CPU compile

B, POINT_NUM = 2, 1024
LR, WD, CLIP = 5e-4, 0.05, 10.0
STEPS = 3


def _torch_peft_adamw(model):
    """requires_grad per runner_module.py:62-73 + decay groups per
    builder.py:40-53."""
    for name, p in model.named_parameters():
        p.requires_grad_(any(t in name for t in PEFT_LIST))
    decay, no_decay = [], []
    for name, p in model.named_parameters():
        if not p.requires_grad:
            continue
        if len(p.shape) == 1 or name.endswith(".bias") or "token" in name:
            no_decay.append(p)
        else:
            decay.append(p)
    return torch.optim.AdamW(
        [{"params": no_decay, "weight_decay": 0.0},
         {"params": decay, "weight_decay": WD}], lr=LR, weight_decay=WD)


def test_three_peft_steps_match_reference():
    ns = load_reference_models()
    torch.manual_seed(0)
    tm = ns["unify"]["Point_MAE_unify"](RefCfg(FLAGSHIP))
    _randomize_weights(tm, seed=3)
    randomize_bn_stats(tm, seed=4)
    tm.eval()  # deterministic forward; backward still works in eval mode

    rng = np.random.default_rng(5)
    pts = rng.standard_normal((B, POINT_NUM + 72, 3)).astype(np.float32)
    label = rng.integers(0, 40, B).astype(np.int64)

    # ---- torch side -------------------------------------------------------
    opt = _torch_peft_adamw(tm)
    t_losses = []
    for _ in range(STEPS):
        ret = tm(torch.from_numpy(pts), completion_prompt=True, denoise=True,
                 point_num=POINT_NUM)
        loss = torch.nn.functional.cross_entropy(
            ret, torch.from_numpy(label))
        opt.zero_grad(set_to_none=True)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), CLIP, norm_type=2)
        opt.step()
        t_losses.append(float(loss))

    # ---- flax side (weights through the production shim) ------------------
    torch.manual_seed(0)   # same global-RNG init state as tm's construction
    tm2 = ns["unify"]["Point_MAE_unify"](RefCfg(FLAGSHIP))
    _randomize_weights(tm2, seed=3)          # same init as tm had pre-update
    randomize_bn_stats(tm2, seed=4)
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        path = _export(Path(td), tm2)
        fm = build_model_from_cfg(ConfigDict.from_nested(FLAGSHIP))
        rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
                "droppath": jax.random.key(2)}
        variables = dict(jit_init(fm, rngs,
                                  jnp.zeros((2, POINT_NUM + 72, 3), jnp.float32),
                                  completion_prompt=True, denoise=True,
                                  point_num=POINT_NUM, deterministic=True))
        variables.setdefault("batch_stats", {})
        variables, missing, unexpected = load_into_variables(
            variables, load_torch_state_dict(path))
        assert not missing and not unexpected, (missing[:5], unexpected[:5])

    config = ConfigDict.from_nested({
        "optimizer": {"type": "AdamW", "kwargs": {"lr": LR, "weight_decay": WD}},
        # initial_epochs=0 + huge steps_per_epoch → lr == base for 3 steps
        "scheduler": {"type": "CosLR", "kwargs": {"epochs": 10,
                                                  "initial_epochs": 0}},
        "grad_norm_clip": CLIP,
    })
    tx, sched, _ = build_optimizer(config, variables["params"],
                                   steps_per_epoch=100000,
                                   peft_list=PEFT_LIST)
    np.testing.assert_allclose(float(sched(0)), LR, rtol=1e-6)

    params = variables["params"]
    stats = variables["batch_stats"]
    jpts = jnp.asarray(pts)
    jlabel = jnp.asarray(label.astype(np.int32))

    def loss_fn(p):
        logits = fm.apply({"params": p, "batch_stats": stats}, jpts,
                          completion_prompt=True, denoise=True,
                          point_num=POINT_NUM, deterministic=True)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, jlabel).mean()

    @jax.jit
    def step(p, o):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    opt_state = tx.init(params)
    f_losses = []
    for _ in range(STEPS):
        params, opt_state, loss = step(params, opt_state)
        f_losses.append(float(loss))

    # step-0 loss = pure forward parity (f32 op-order rounding ≈ 1e-4 rel
    # across the 3-pass forward); steps 1-2 compound the optimizer — an
    # optimizer-semantics bug (decay grouping, masking, clip, Adam eps/betas)
    # shows up as growth well beyond this tolerance
    np.testing.assert_allclose(f_losses, t_losses, rtol=1e-3, atol=1e-3)
    assert t_losses[2] < t_losses[0], "PEFT steps should reduce the loss"
