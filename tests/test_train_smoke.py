"""End-to-end smoke training: the PEFT/unify runner on the synthetic dataset
(SURVEY.md §4d — e2e smoke runs per config with synthetic data)."""

import types

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from upp_tpu.train import runner_cls
from upp_tpu.train.optim import peft_detect, trainable_mask
from upp_tpu.utils.config import ConfigDict


def tiny_config(tmp_path, noisy=True, max_epoch=1):
    ds = {"NAME": "Synthetic", "N_POINTS": 512, "NUM_CATEGORY": 4, "SIZE": 16}
    return ConfigDict.from_nested({
        "optimizer": {"type": "AdamW", "kwargs": {"lr": 5e-4, "weight_decay": 0.05}},
        "scheduler": {"type": "CosLR", "kwargs": {"epochs": 10, "initial_epochs": 1}},
        "dataset": {
            "train": {"_base_": ds, "others": {"subset": "train", "bs": 8}},
            "val": {"_base_": ds, "others": {"subset": "test", "bs": 8}},
            "test": {"_base_": ds, "others": {"subset": "test", "bs": 8}},
        },
        "model": {
            "NAME": "Point_MAE_unify",
            "transformer_config": {
                "mask_ratio": 0.5, "mask_type": "rand", "trans_dim": 48,
                "encoder_dims": 48, "depth": 4, "drop_path_rate": 0.1,
                "num_heads": 4, "decoder_depth": 2, "decoder_num_heads": 4,
            },
            "cls_dim": 4, "group_size": 8, "num_group": 16,
            "prompter_config": {
                "rectify_adapter": True, "rectify_prompts": True,
                "rectify_prompts_num": 2, "rectify_prompts_depth": 2,
                "rectify_depth": 2,
                "pretask_adapter": True, "pretask_prompts": True,
                "pretask_prompts_num": 2, "pretask_prompts_depth": 3,
                "pretask_depth": 3,
                "downstream_adapter": True, "downstream_prompts": True,
                "downstream_prompts_num": 3, "downstream_prompts_depth": 2,
                "downstream_depth": 4,
            },
            "gather_idx": False, "prompt_propagation_after": True,
        },
        "npoints": 128, "total_bs": 8, "step_per_update": 1,
        "max_epoch": max_epoch, "grad_norm_clip": 10,
        "task": "classification", "data_augmentation": "scale-translate",
        "noisy_train": noisy, "noisy_validate": False,
    })


def tiny_args(tmp_path):
    return types.SimpleNamespace(
        seed=0, ckpts=None, resume=False, peft_model=True,
        incomplete_cropping=True, incomplete_shape=True, noise=True,
        noise_type=["gaussian_noise", "lidar_noise"], normalize=False,
        joint_optimization=-1, val_freq=10, vote=False,
        experiment_path=str(tmp_path), log_name="test")


def test_peft_run_net_trains_and_freezes_backbone(tmp_path):
    config = tiny_config(tmp_path, max_epoch=1)
    args = tiny_args(tmp_path)

    # capture init params to compare after training
    example = jax.numpy.zeros((2, 128 + 72, 3), jax.numpy.float32)
    model, variables0 = runner_cls.init_model(args, config, example)
    p0 = jax.device_get(variables0["params"])

    best = runner_cls.run_net(args, config)
    assert best.acc >= 0.0

    # reload last checkpoint and verify the PEFT invariant: backbone frozen,
    # downstream adapters/head moved
    from upp_tpu.train import checkpoint as ckpt
    from upp_tpu.train.state import TrainState
    state = TrainState(params=variables0["params"],
                       batch_stats=variables0["batch_stats"],
                       opt_state=jax.tree_util.tree_map(lambda x: x, variables0["params"]),
                       step=0)
    # build the same-shaped opt state via the real optimizer
    from upp_tpu.train.optim import build_optimizer
    tx, _, _ = build_optimizer(config, variables0["params"], 1,
                               peft_list=runner_cls.PEFT_LIST)
    state = state.replace(opt_state=tx.init(variables0["params"]))
    state, start_epoch, _ = ckpt.resume_checkpoint(state, str(tmp_path))
    assert start_epoch >= 1

    p1 = jax.device_get(state.params)
    flat0 = jax.tree_util.tree_flatten_with_path(p0)[0]
    flat1 = {tuple(str(k) for k in path): v
             for path, v in jax.tree_util.tree_flatten_with_path(p1)[0]}
    changed, frozen_ok = 0, True
    for path, v0 in flat0:
        key = tuple(str(k) for k in path)
        name = "/".join(str(k) for k in path)
        v1 = flat1[key]
        is_trainable = peft_detect(name, runner_cls.PEFT_LIST)
        same = np.allclose(np.asarray(v0), np.asarray(v1))
        if is_trainable and not same:
            changed += 1
        if not is_trainable and not same:
            frozen_ok = False
    assert frozen_ok, "a frozen (backbone) parameter moved"
    assert changed > 0, "no trainable parameter moved"


def test_clean_path_run_net(tmp_path):
    """noisy_train=False branch: FPS-subsample pipeline + downstream-only pass
    (regression for the clean-path program). Also runs with
    step_per_update=2 to cover gradient accumulation end-to-end."""
    config = tiny_config(tmp_path, noisy=False, max_epoch=1)
    config.step_per_update = 2
    args = tiny_args(tmp_path)
    best = runner_cls.run_net(args, config)
    assert best.acc >= 0.0


def test_resume_past_joint_switch_keeps_joint_set(tmp_path):
    """A run resumed AFTER the joint-optimization epoch must come back up with
    the joint trainable set (the `epoch == joint_epoch` trigger can never
    fire again): prompter params — frozen under PEFT_LIST, trainable under
    JOINT_PEFT_LIST — must keep moving in the resumed epochs. (The reference
    silently reverts to the pre-joint set on such a resume; fixed here.)"""
    config = tiny_config(tmp_path, max_epoch=1)
    args = tiny_args(tmp_path)
    args.joint_optimization = 0      # switch fires at the end of epoch 0
    runner_cls.run_net(args, config)

    from upp_tpu.train import checkpoint as ckpt
    from upp_tpu.train.optim import build_optimizer
    from upp_tpu.train.state import TrainState

    def load_last():
        example = jax.numpy.zeros((2, 200, 3), jax.numpy.float32)
        model, variables = runner_cls.init_model(args, config, example)
        tx, _, _ = build_optimizer(config, variables["params"], 1,
                                   peft_list=runner_cls.JOINT_PEFT_LIST)
        st = TrainState(params=variables["params"],
                        batch_stats=variables["batch_stats"],
                        opt_state=tx.init(variables["params"]), step=0)
        st, ep, _ = ckpt.resume_checkpoint(st, str(tmp_path))
        return jax.device_get(st.params), ep

    p_before, ep = load_last()
    assert ep == 2  # resumed run starts past the switch epoch

    args.resume = True
    config.max_epoch = 3
    runner_cls.run_net(args, config)
    p_after, _ = load_last()

    flat_after = {tuple(str(k) for k in path): v for path, v in
                  jax.tree_util.tree_flatten_with_path(p_after)[0]}
    joint_only_moved = False
    for path, v0 in jax.tree_util.tree_flatten_with_path(p_before)[0]:
        name = "/".join(str(k) for k in path)
        if (peft_detect(name, runner_cls.JOINT_PEFT_LIST)
                and not peft_detect(name, runner_cls.PEFT_LIST)):
            if not np.allclose(np.asarray(v0),
                               np.asarray(flat_after[tuple(str(k) for k in path)])):
                joint_only_moved = True
                break
    assert joint_only_moved, \
        "no joint-only (prompter) param moved after resume — switch lost"


def test_resume_is_bitwise_equivalent_to_uninterrupted(tmp_path):
    """Preemption recovery guarantee: N epochs straight == k epochs + resume
    + (N-k) epochs, down to the last bit of params/batch_stats/step. Holds
    because every stochastic stream is derived from persistent state (the
    per-step rng is fold_in(step), the loader shuffle is seeded by epoch) and
    the orbax round trip is exact. The reference has no such guarantee test;
    its --resume restores weights+epoch only (tools/builder.py:91-125)."""
    from upp_tpu.train import checkpoint as ckpt
    from upp_tpu.train.optim import build_optimizer
    from upp_tpu.train.state import TrainState

    def final_state(exp_dir):
        example = jax.numpy.zeros((2, 128 + 72, 3), jax.numpy.float32)
        model, variables = runner_cls.init_model(
            tiny_args(exp_dir), tiny_config(exp_dir, noisy=False), example)
        tx, _, _ = build_optimizer(tiny_config(exp_dir, noisy=False),
                                   variables["params"], 1,
                                   peft_list=runner_cls.PEFT_LIST)
        st = TrainState(params=variables["params"],
                        batch_stats=variables["batch_stats"],
                        opt_state=tx.init(variables["params"]), step=0)
        st, ep, _ = ckpt.resume_checkpoint(st, str(exp_dir))
        return jax.device_get(st), ep

    # run A: 4 epochs uninterrupted
    dir_a = tmp_path / "a"
    dir_a.mkdir()
    config = tiny_config(dir_a, noisy=False, max_epoch=3)
    args = tiny_args(dir_a)
    runner_cls.run_net(args, config)
    st_a, ep_a = final_state(dir_a)

    # run B: 2 epochs, "preempt", resume for the remaining 2
    dir_b = tmp_path / "b"
    dir_b.mkdir()
    config = tiny_config(dir_b, noisy=False, max_epoch=1)
    args = tiny_args(dir_b)
    runner_cls.run_net(args, config)
    config = tiny_config(dir_b, noisy=False, max_epoch=3)
    args = tiny_args(dir_b)
    args.resume = True
    runner_cls.run_net(args, config)
    st_b, ep_b = final_state(dir_b)

    assert ep_a == ep_b == 4
    assert int(st_a.step) == int(st_b.step)
    for tree_a, tree_b, what in [(st_a.params, st_b.params, "params"),
                                 (st_a.batch_stats, st_b.batch_stats, "bn"),
                                 (st_a.opt_state, st_b.opt_state, "opt")]:
        la = jax.tree_util.tree_leaves(tree_a)
        lb = jax.tree_util.tree_leaves(tree_b)
        assert len(la) == len(lb), what
        for xa, xb in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb),
                                          err_msg=what)


def test_eval_and_vote(tmp_path):
    config = tiny_config(tmp_path, max_epoch=1)
    args = tiny_args(tmp_path)
    example = jax.numpy.zeros((2, 200, 3), jax.numpy.float32)
    model, variables = runner_cls.init_model(args, config, example)
    from upp_tpu.train.state import TrainState
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=None, step=0)
    from upp_tpu.data import BatchLoader, build_dataset_from_cfg
    ds = build_dataset_from_cfg(config.dataset.test._base_,
                                config.dataset.test.others)
    loader = BatchLoader(ds, 8)
    acc = runner_cls.test_vote(model, state, loader, config, args, times=2)
    assert 0.0 <= acc <= 100.0
