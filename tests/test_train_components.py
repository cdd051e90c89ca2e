"""Training-layer components: schedule semantics, PEFT/decay masks, config
surface, loader sharding, metrics."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.quick

from upp_tpu.train.optim import (build_optimizer, build_schedule, peft_detect,
                                 trainable_mask, weight_decay_mask)
from upp_tpu.train.metrics import (AccMetric, AverageMeter, CDMetric, Metrics,
                                   cross_entropy_loss_acc, nll_seg_loss,
                                   seg_miou_metrics)
from upp_tpu.utils.config import ConfigDict, cfg_from_yaml_file


def _cfg(lr=5e-4, epochs=300, warmup=10):
    return ConfigDict.from_nested({
        "optimizer": {"type": "AdamW", "kwargs": {"lr": lr, "weight_decay": 0.05}},
        "scheduler": {"type": "CosLR", "kwargs": {"epochs": epochs,
                                                  "initial_epochs": warmup}},
        "grad_norm_clip": 10,
    })


def test_cosine_schedule_matches_timm_semantics():
    """CosLR == timm CosineLRScheduler(t_initial, lr_min=1e-6,
    warmup_lr_init=1e-6, warmup_t, t_in_epochs=True) stepped per epoch
    (tools/builder.py:66-75)."""
    cfg = _cfg(lr=5e-4, epochs=300, warmup=10)
    steps_per_epoch = 7
    sched = build_schedule(cfg.optimizer, cfg.scheduler, steps_per_epoch)
    # epoch 0: warmup start
    np.testing.assert_allclose(float(sched(0)), 1e-6, rtol=1e-5)
    # warmup is linear: epoch 5 of 10
    want = 1e-6 + (5e-4 - 1e-6) * 5 / 10
    np.testing.assert_allclose(float(sched(5 * steps_per_epoch)), want, rtol=1e-5)
    # first post-warmup epoch: timm's default warmup_prefix=False indexes the
    # cosine by the RAW epoch (t=10/300), not by epoch-warmup
    want = 1e-6 + 0.5 * (5e-4 - 1e-6) * (1 + np.cos(np.pi * 10 / 300))
    np.testing.assert_allclose(float(sched(10 * steps_per_epoch)), want, rtol=1e-5)
    # final epoch approaches lr_min
    t = 300 / 300
    want = 1e-6 + 0.5 * (5e-4 - 1e-6) * (1 + np.cos(np.pi * t))
    np.testing.assert_allclose(float(sched(300 * steps_per_epoch)), want, rtol=1e-4)
    # within an epoch the lr is constant (per-epoch stepping)
    assert float(sched(10 * steps_per_epoch)) == float(sched(10 * steps_per_epoch + 6))


def test_weight_decay_mask_rules():
    params = {
        "blocks": {"attn_qkv_kernel": jnp.zeros((12, 8, 24)),
                   "norm1_scale": jnp.zeros((12, 8)),
                   "attn_proj_bias": jnp.zeros((12, 8)),
                   "downstream_prompts": jnp.zeros((6, 10, 8))},
        "cls_token": jnp.zeros((1, 1, 8)),
        "head": {"kernel": jnp.zeros((8, 4)), "bias": jnp.zeros((4,))},
    }
    mask = weight_decay_mask(params)
    assert mask["blocks"]["attn_qkv_kernel"]
    assert not mask["blocks"]["norm1_scale"]       # norm scales never decay
    assert not mask["blocks"]["attn_proj_bias"]
    assert mask["blocks"]["downstream_prompts"]    # prompts decay (2D in ref)
    assert not mask["cls_token"]                   # 'token' in name
    assert mask["head"]["kernel"]
    assert not mask["head"]["bias"]


def test_frozen_params_get_zero_updates():
    params = {"downstream_adapter_ln1_kernel": jnp.ones((2, 4, 8)),
              "backbone_kernel": jnp.ones((4, 8))}
    cfg = _cfg()
    tx, _, mask = build_optimizer(cfg, params, steps_per_epoch=1,
                                  peft_list=["downstream_adapter"])
    assert mask["downstream_adapter_ln1_kernel"] and not mask["backbone_kernel"]
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["backbone_kernel"]).max()) == 0.0
    assert float(jnp.abs(updates["downstream_adapter_ln1_kernel"]).max()) > 0.0


def test_joint_switch_preserves_optimizer_moments():
    """The joint-optimization switch must reproduce the reference's in-place
    requires_grad flip (tools/runner_module.py:228-242): torch AdamW is built
    over ALL params, skips grad-less ones, and keeps per-param moments+steps
    for params that stay trainable across the switch. Train 2 steps with the
    adapter trainable, unfreeze everything, 2 more steps — final params must
    match torch bit-for-bit (f32 tolerance), which only happens if (a) the
    surviving moments are reused and (b) the newly-unfrozen param gets fresh
    lazy bias correction."""
    import torch

    lr, wd = 1e-3, 0.05
    rng = np.random.RandomState(0)
    ga = [rng.randn(4, 8).astype(np.float32) * 0.1 for _ in range(4)]
    gb = [rng.randn(2, 4).astype(np.float32) * 0.1 for _ in range(4)]

    # --- torch oracle: optimizer over all params, requires_grad flip
    pa = torch.nn.Parameter(torch.ones(4, 8))
    pb = torch.nn.Parameter(torch.ones(2, 4))
    opt = torch.optim.AdamW([pa, pb], lr=lr, weight_decay=wd)
    for s in range(4):
        pa.grad = torch.from_numpy(ga[s]) if s >= 2 else None  # frozen early
        pb.grad = torch.from_numpy(gb[s])
        opt.step()
        opt.zero_grad(set_to_none=True)

    # --- UPP-TPU: mask-stable AdamW, transform swap keeps the state
    cfg = ConfigDict.from_nested({
        "optimizer": {"type": "AdamW", "kwargs": {"lr": lr, "weight_decay": wd}},
        "scheduler": {"type": "function", "kwargs": {}},
        "grad_norm_clip": 10,
    })
    params = {"backbone_kernel": jnp.ones((4, 8)),
              "adapter_kernel": jnp.ones((2, 4))}
    tx, _, _ = build_optimizer(cfg, params, steps_per_epoch=1,
                               peft_list=["adapter"])
    state = tx.init(params)
    import optax
    for s in range(2):
        grads = {"backbone_kernel": jnp.asarray(ga[s]),  # zeroed by the mask
                 "adapter_kernel": jnp.asarray(gb[s])}
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    tx2, _, _ = build_optimizer(cfg, params, steps_per_epoch=1, peft_list=None)
    for s in range(2, 4):
        grads = {"backbone_kernel": jnp.asarray(ga[s]),
                 "adapter_kernel": jnp.asarray(gb[s])}
        updates, state = tx2.update(grads, state, params)  # state REUSED
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["adapter_kernel"]),
                               pb.detach().numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(params["backbone_kernel"]),
                               pa.detach().numpy(), rtol=1e-6, atol=1e-7)


def test_step_per_update_grad_accumulation():
    """config.step_per_update > 1 reproduces the reference's accumulation
    (runner_module.py:199-207): micro-grads are SUMMED; every k-th call the
    real chain (clip first) runs on the sum, other calls emit zero updates;
    Adam moments/step counts advance only on real steps."""
    from upp_tpu.train.optim import build_optimizer

    cfg = ConfigDict.from_nested({
        "optimizer": {"type": "AdamW", "kwargs": {"lr": 1e-3,
                                                  "weight_decay": 0.05}},
        "scheduler": {"type": "function", "kwargs": {}},
        "grad_norm_clip": 10.0,
        "step_per_update": 3,
    })
    params = {"w": jnp.ones((4, 8)), "b": jnp.zeros((8,))}
    tx, _, _ = build_optimizer(cfg, params, steps_per_epoch=1, peft_list=None)
    cfg_plain = ConfigDict.from_nested({
        "optimizer": {"type": "AdamW", "kwargs": {"lr": 1e-3,
                                                  "weight_decay": 0.05}},
        "scheduler": {"type": "function", "kwargs": {}},
        "grad_norm_clip": 10.0,
    })
    tx_plain, _, _ = build_optimizer(cfg_plain, params, steps_per_epoch=1,
                                     peft_list=None)

    gs = [jax.tree_util.tree_map(
        lambda x, i=i: jnp.full_like(x, 0.1 * (i + 1)), params)
        for i in range(3)]

    state = tx.init(params)
    for i, g in enumerate(gs):
        updates, state = tx.update(g, state, params)
        flat = jax.tree_util.tree_leaves(updates)
        if i < 2:   # micro-steps: zero updates, params unchanged
            assert all(float(jnp.abs(u).max()) == 0.0 for u in flat), i
    # 3rd call: equals one plain step on the SUMMED grads
    g_sum = jax.tree_util.tree_map(lambda a, b, c: a + b + c, *gs)
    want, _ = tx_plain.update(g_sum, tx_plain.init(params), params)
    for u, w in zip(jax.tree_util.tree_leaves(updates),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(u), np.asarray(w), rtol=1e-6)

    # and the cycle repeats: next two calls are zero again
    updates, state = tx.update(gs[0], state, params)
    assert all(float(jnp.abs(u).max()) == 0.0
               for u in jax.tree_util.tree_leaves(updates))


def test_joint_switch_non_adamw_needs_state_reinit():
    """Adam/SGD go through optax.multi_transform whose state STRUCTURE follows
    the trainable mask — swapping the transform while keeping the old state
    must fail, which is why the runners re-init opt_state for non-AdamW at
    the joint/stage-2 switches (runner_cls.apply_joint_switch)."""
    import optax
    import pytest

    cfg = ConfigDict.from_nested({
        "optimizer": {"type": "Adam", "kwargs": {"lr": 1e-3}},
        "scheduler": {"type": "function", "kwargs": {}},
    })
    params = {"backbone_kernel": jnp.ones((4, 8)),
              "adapter_kernel": jnp.ones((2, 4))}
    tx, _, _ = build_optimizer(cfg, params, steps_per_epoch=1,
                               peft_list=["adapter"])
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    _, state = tx.update(grads, state, params)

    tx2, _, _ = build_optimizer(cfg, params, steps_per_epoch=1,
                                peft_list=None)
    with pytest.raises(Exception):
        tx2.update(grads, state, params)      # stale masked structure
    fresh = tx2.init(params)                  # the runner's re-init path
    updates, _ = tx2.update(grads, fresh, params)
    assert float(jnp.abs(updates["backbone_kernel"]).max()) > 0.0


def test_all_shipped_configs_build_models():
    """The full cfgs/ surface parses and resolves to registered models."""
    import glob
    from upp_tpu.models import build_model_from_cfg
    for f in sorted(glob.glob("cfgs/*.yaml")):
        cfg = cfg_from_yaml_file(f)
        model = build_model_from_cfg(cfg.model)
        assert model is not None, f
        assert "task" in cfg and "total_bs" in cfg, f


def test_batch_loader_sharding_and_epochs():
    from upp_tpu.data import BatchLoader, build_dataset_from_cfg
    ds = build_dataset_from_cfg(
        {"NAME": "Synthetic", "N_POINTS": 64, "NUM_CATEGORY": 4, "SIZE": 32},
        {"subset": "train"})
    l0 = BatchLoader(ds, 4, shuffle=True, drop_last=True, num_shards=2, shard_index=0)
    l1 = BatchLoader(ds, 4, shuffle=True, drop_last=True, num_shards=2, shard_index=1)
    b0 = [b for b in l0]
    b1 = [b for b in l1]
    assert len(b0) == len(b1) == 4          # 32/2 shards/4 bs
    assert b0[0][0].shape == (4, 64, 3)
    assert b0[0][1].dtype == np.int32
    # epoch reshuffle changes order
    l0.set_epoch(1)
    b0e1 = [b for b in l0]
    assert not np.allclose(b0[0][0], b0e1[0][0])


def test_seg_miou_metrics_perfect_prediction():
    from upp_tpu.data.partnormal import SEG_CLASSES
    # two airplanes (parts 0-3) predicted perfectly
    targets = np.array([[0, 1, 2, 3, 0, 1], [2, 2, 3, 0, 1, 0]], np.int32)
    m = seg_miou_metrics(targets.copy(), targets, np.zeros(2, np.int32),
                         SEG_CLASSES)
    assert m["accuracy"] == 1.0
    assert m["instance_avg_iou"] == 1.0
    assert m["per_category_iou"]["Airplane"] == 1.0


def test_metrics_facade():
    a = np.random.default_rng(0).standard_normal((1, 32, 3)).astype(np.float32)
    vals = Metrics.get(a, a)
    names = Metrics.names()
    assert names == ["F-Score", "CDL1", "CDL2"]
    assert vals[0] > 0.99          # F-score of identical clouds
    # CDL1 of identical clouds is exactly sqrt(eps)*1000 = 1e-3 (sqrt clamp)
    assert vals[1] <= 1.1e-3 and vals[2] <= 1.1e-3
    assert Metrics.better_than("F-Score", 0.9, 0.5)
    assert Metrics.better_than("CDL2", 0.1, 0.5)


def test_average_meter():
    m = AverageMeter(["a", "b"])
    m.update([1.0, 2.0])
    m.update([3.0, 4.0])
    assert m.avg(0) == 2.0 and m.avg(1) == 3.0
    assert m.val(0) == 3.0
    assert AccMetric(2.0).better_than(AccMetric(1.0))
    assert CDMetric(1.0).better_than(CDMetric(2.0))
