"""End-to-end smoke runs for the pretask and segmentation runners (synthetic
data, tiny models, 1-2 epochs) — SURVEY.md §4d."""

import types

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from upp_tpu.utils.config import ConfigDict


def _args(tmp_path, **kw):
    base = dict(seed=0, ckpts=None, resume=False, peft_model=True,
                incomplete_cropping=True, incomplete_shape=True, noise=True,
                noise_type=["gaussian_noise", "lidar_noise"], normalize=False,
                joint_optimization=-1, val_freq=1, vote=False, mode=None,
                deviation=0.1, noise_radius=0.8,
                experiment_path=str(tmp_path), log_name="test")
    base.update(kw)
    return types.SimpleNamespace(**base)


def _transformer(dim=48, depth=4):
    return {"mask_ratio": 0.5, "mask_type": "rand", "trans_dim": dim,
            "encoder_dims": dim, "depth": depth, "drop_path_rate": 0.1,
            "num_heads": 4, "decoder_depth": 2, "decoder_num_heads": 4}


def _prompter(downstream=True):
    p = {"rectify_adapter": True, "rectify_prompts": True,
         "rectify_prompts_num": 2, "rectify_prompts_depth": 2,
         "rectify_depth": 2, "pretask_adapter": True, "pretask_prompts": True,
         "pretask_prompts_num": 2, "pretask_prompts_depth": 3,
         "pretask_depth": 3}
    if downstream:
        p.update({"downstream_adapter": True, "downstream_prompts": True,
                  "downstream_prompts_num": 2, "downstream_prompts_depth": 2,
                  "downstream_depth": 4})
    return p


def test_pretask_runner_smoke(tmp_path):
    from upp_tpu.train import runner_pretask
    ds = {"NAME": "Synthetic", "N_POINTS": 512, "NUM_CATEGORY": 4, "SIZE": 16}
    config = ConfigDict.from_nested({
        "optimizer": {"type": "AdamW", "kwargs": {"lr": 1e-3, "weight_decay": 0.05}},
        "scheduler": {"type": "CosLR", "kwargs": {"epochs": 5, "initial_epochs": 0}},
        "dataset": {
            "train": {"_base_": ds, "others": {"subset": "train", "bs": 8}},
            "val": {"_base_": ds, "others": {"subset": "test", "bs": 8}},
            "test": {"_base_": ds, "others": {"subset": "test", "bs": 8}},
        },
        "model": {"NAME": "Point_MAE_pretask_dev", "group_size": 8,
                  "num_group": 16, "loss": "cdl2",
                  "transformer_config": _transformer(),
                  "prompter_config": _prompter(downstream=False),
                  "gather_idx": True, "prompt_propagation_after": True},
        "npoints": 128, "total_bs": 8, "step_per_update": 1, "max_epoch": 0,
        "task": "pretask", "data_augmentation": "scale-translate",
    })
    best = runner_pretask.run_net(_args(tmp_path), config)
    assert np.isfinite(best.cd)

    # detailed test path: per-taxonomy Metrics table + Overall row
    # (reference tools/runner_pretask.py:314-450), captured via the logger
    import logging

    from upp_tpu.data import build_dataset_from_cfg
    from upp_tpu.models import build_model_from_cfg
    from upp_tpu.models.build import jit_init
    from upp_tpu.train.state import TrainState
    import jax
    import jax.numpy as jnp

    model = build_model_from_cfg(config.model)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2)}
    variables = dict(jit_init(
        model, rngs,
        jnp.zeros((2, 128 + runner_pretask.GAUSSIAN_NUM
                   + runner_pretask.LIDAR_NUM, 3), jnp.float32),
        point_num=128, train_with_gaussian=True, deterministic=False))
    variables.setdefault("batch_stats", {})
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=None, step=jnp.zeros((), jnp.int32))
    eval_step = runner_pretask.make_pretask_eval_step(model, config)

    class _Tiny:
        def __init__(self, ds, n): self.ds, self.n = ds, n
        def __len__(self): return self.n
        def __getitem__(self, i): return self.ds[i]

    test_ds = _Tiny(build_dataset_from_cfg(
        config.dataset.test._base_, config.dataset.test.others), 3)
    records = []
    h = logging.Handler()
    h.emit = lambda rec: records.append(rec.getMessage())
    logging.getLogger("test").addHandler(h)
    try:
        m = runner_pretask.validate_detailed(eval_step, state, test_ds, 0,
                                             logger="test")
    finally:
        logging.getLogger("test").removeHandler(h)
    assert np.isfinite(m.cd)
    text = "\n".join(records)
    assert "TEST RESULTS" in text
    assert "Taxonomy\t#Sample\tF-Score\tCDL1\tCDL2" in text
    assert "Overall" in text
    # one row per taxonomy with 8 viewpoint updates per sample (3 samples
    # cycle through cat0..cat2, one each)
    for tax in ("cat0", "cat1", "cat2"):
        assert any(line.startswith(f"{tax}\t8\t") for line in records), records


def test_seg_runner_smoke(tmp_path):
    from upp_tpu.train import runner_seg
    ds = {"NAME": "SyntheticPart", "N_POINTS": 256, "SIZE": 16}
    config = ConfigDict.from_nested({
        "optimizer": {"type": "AdamW", "kwargs": {"lr": 2e-4, "weight_decay": 0.05}},
        "scheduler": {"type": "CosLR", "kwargs": {"epochs": 5, "initial_epochs": 0}},
        "dataset": {
            "train": {"_base_": ds, "others": {"subset": "trainval", "bs": 8}},
            "val": {"_base_": ds, "others": {"subset": "test", "bs": 8}},
            "test": {"_base_": ds, "others": {"subset": "test", "bs": 8}},
        },
        "model": {"NAME": "Point_MAE_unify_seg", "cls_dim": 50,
                  "group_size": 8, "num_group": 16,
                  "transformer_config": _transformer(),
                  "prompter_config": _prompter(),
                  "gather_idx": True, "prompt_propagation_after": False},
        "npoints": 256, "total_bs": 8, "step_per_update": 1, "max_epoch": 0,
        "grad_norm_clip": 10, "task": "segmentation",
        "data_augmentation": "scale-translate",
        "noisy_train": True, "noisy_validate": False,
    })
    metrics = runner_seg.run_net(_args(tmp_path), config)
    assert 0.0 <= metrics["accuracy"] <= 1.0
    assert 0.0 <= metrics["instance_avg_iou"] <= 1.0


def test_pretask_validate_batched_equals_bs1():
    """validate() at val bs = train bs returns the same CD as the bs=1 sweep
    (the reference evaluates at bs=1, runner_pretask.py:359-385; our eval
    step returns per-sample vectors so batching is wall-clock-only —
    VERDICT r3 item 5). Dataset size 7 with bs 5 forces a partial batch."""
    import jax.numpy as jnp

    from upp_tpu.data import BatchLoader, build_dataset_from_cfg
    from upp_tpu.models import build_model_from_cfg
    from upp_tpu.models.build import jit_init
    from upp_tpu.train import runner_pretask
    from upp_tpu.train.state import TrainState
    from upp_tpu.utils.config import ConfigDict

    ds = {"NAME": "Synthetic", "N_POINTS": 512, "NUM_CATEGORY": 4, "SIZE": 16}
    config = ConfigDict.from_nested({
        "dataset": {"val": {"_base_": ds, "others": {"subset": "test", "bs": 5}}},
        "model": {"NAME": "Point_MAE_pretask_dev", "group_size": 8,
                  "num_group": 16, "loss": "cdl2",
                  "transformer_config": _transformer(),
                  "prompter_config": _prompter(downstream=False),
                  "gather_idx": True, "prompt_propagation_after": True},
        "npoints": 128,
    })
    model = build_model_from_cfg(config.model)
    import jax
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2)}
    variables = dict(jit_init(
        model, rngs,
        jnp.zeros((2, 128 + runner_pretask.GAUSSIAN_NUM
                   + runner_pretask.LIDAR_NUM, 3), jnp.float32),
        point_num=128, train_with_gaussian=True, deterministic=False))
    variables.setdefault("batch_stats", {})
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=None, step=jnp.zeros((), jnp.int32))
    eval_step = runner_pretask.make_pretask_eval_step(model, config)

    class _Tiny:
        def __init__(self, ds, n): self.ds, self.n = ds, n
        def __len__(self): return self.n
        def __getitem__(self, i): return self.ds[i]

    val_ds = _Tiny(build_dataset_from_cfg(
        config.dataset.val._base_, config.dataset.val.others), 7)
    m_b = runner_pretask.validate(eval_step, state,
                                  BatchLoader(val_ds, 5), 0, logger="test")
    m_1 = runner_pretask.validate(eval_step, state,
                                  BatchLoader(val_ds, 1), 0, logger="test")
    assert np.isfinite(m_b.cd)
    np.testing.assert_allclose(m_b.cd, m_1.cd, rtol=1e-5)
