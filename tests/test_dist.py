"""Multi-device mesh coverage: the full PEFT train step over virtual CPU
meshes of several sizes (SURVEY.md §4e; the driver separately runs
dryrun_multichip(N))."""

import jax
import pytest

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("n_devices", [2, 8])
def test_dryrun_multichip(n_devices):
    import __graft_entry__ as g
    g.dryrun_multichip(n_devices)


def test_sharded_step_matches_single_device():
    """The 8-device batch-sharded train step must produce the SAME loss and
    updated parameters as the 1-device run on identical inputs — catches
    sharding-semantics bugs (wrong collective, per-shard BN/normalization)
    that a smoke run can't. Replaces reference dist_utils collective checks
    (``utils/dist_utils.py:41-54``)."""
    import types

    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_cfg
    from upp_tpu.models import build_model_from_cfg
    from upp_tpu.models.build import jit_init
    from upp_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from upp_tpu.train.optim import build_optimizer
    from upp_tpu.train.runner_cls import PEFT_LIST, make_train_step
    from upp_tpu.train.state import TrainState
    from upp_tpu.utils.config import ConfigDict

    point_num, n_pts_ds, B = 128, 512, 8
    config = ConfigDict.from_nested({
        "model": _flagship_cfg(tiny=True).to_plain(),
        "optimizer": {"type": "AdamW", "kwargs": {"lr": 5e-4, "weight_decay": 0.05}},
        "scheduler": {"type": "CosLR", "kwargs": {"epochs": 10, "initial_epochs": 1}},
        "dataset": {"train": {"_base_": {"N_POINTS": n_pts_ds}}},
        "npoints": point_num, "grad_norm_clip": 10,
        "noisy_train": True, "data_augmentation": "scale-translate",
    })
    args = types.SimpleNamespace(incomplete_cropping=True, noise=True,
                                 noise_type=("gaussian_noise", "lidar_noise"),
                                 normalize=False)
    model = build_model_from_cfg(config.model)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2)}
    variables = dict(jit_init(model, rngs,
                              jnp.zeros((2, point_num + 72, 3), jnp.float32),
                              completion_prompt=True, denoise=True,
                              point_num=point_num, deterministic=True))
    variables.setdefault("batch_stats", {})
    tx, _, _ = build_optimizer(config, variables["params"], steps_per_epoch=10,
                               peft_list=PEFT_LIST)
    pts_h = np.random.default_rng(0).standard_normal(
        (B, n_pts_ds, 3)).astype(np.float32)
    label_h = np.random.default_rng(1).integers(0, 6, B).astype(np.int32)

    results = {}
    for n_dev in (1, 8):
        mesh = make_mesh(jax.devices()[:n_dev])
        with mesh:
            # fresh copies per mesh: the train step donates its state, and on
            # a 1-device mesh replicate() aliases rather than copies — without
            # this the donated buffers are gone for the second run
            fresh = jax.tree.map(jnp.array, variables)
            state = TrainState(
                params=replicate(mesh, fresh["params"]),
                batch_stats=replicate(mesh, fresh["batch_stats"]),
                opt_state=replicate(mesh, tx.init(fresh["params"])),
                step=jnp.zeros((), jnp.int32))
            step = make_train_step(model, tx, config, args)
            pts = shard_batch(mesh, jnp.asarray(pts_h))
            label = shard_batch(mesh, jnp.asarray(label_h))
            state, m = step(state, pts, label, jax.random.key(7))
            flat = jax.tree_util.tree_leaves(jax.device_get(state.params))
            results[n_dev] = (float(m["loss"]),
                              float(sum(np.abs(l).sum() for l in flat)))
    loss1, p1 = results[1]
    loss8, p8 = results[8]
    np.testing.assert_allclose(loss8, loss1, rtol=2e-5)
    np.testing.assert_allclose(p8, p1, rtol=2e-5)


def test_shard_batch_multi_device():
    import jax.numpy as jnp
    from upp_tpu.parallel.mesh import make_mesh, shard_batch, replicate
    mesh = make_mesh(jax.devices()[:4])
    x = jnp.ones((8, 16, 3))
    xs = shard_batch(mesh, x)
    assert len(xs.sharding.device_set) == 4
    p = replicate(mesh, {"w": jnp.ones((3, 3))})
    assert len(p["w"].sharding.device_set) == 4


def test_fsdp_shardings_placement_rules():
    """Leaves below min_size or with no data-divisible dim stay replicated;
    the largest divisible dim of big leaves is sharded over 'data'."""
    import jax.numpy as jnp

    from upp_tpu.parallel.mesh import fsdp_shardings, make_mesh

    mesh = make_mesh(jax.devices()[:8])
    tree = {
        "small": jnp.zeros((4, 4)),           # < min_size -> replicated
        "odd": jnp.zeros((129, 201)),         # no dim % 8 == 0 -> replicated
        "big": jnp.zeros((48, 512)),          # shard dim 1 (largest divisible)
        "bias": jnp.zeros((4096,)),           # 1-D but large -> shard dim 0
    }
    specs = {k: tuple(s.spec) for k, s in
             fsdp_shardings(mesh, tree, min_size=1024).items()}
    assert specs["small"] == ()
    assert specs["odd"] == ()
    assert specs["big"] == (None, "data")
    assert specs["bias"] == ("data",)

    # single-data-axis mesh degenerates to replicated everywhere
    mesh1 = make_mesh(jax.devices()[:1])
    specs1 = {k: tuple(s.spec) for k, s in
              fsdp_shardings(mesh1, tree, min_size=1024).items()}
    assert all(s == () for s in specs1.values())


def test_fsdp_pretrain_step_matches_replicated():
    """ZeRO-3 path: the full-param MAE pretrain step with params + Adam
    moments sharded over the 8-device data axis (parallel/mesh.fsdp_shardings)
    must reproduce the replicated-dp loss and updated params — GSPMD inserts
    the per-layer all-gathers and gradient reduce-scatters."""
    import jax.numpy as jnp
    import numpy as np

    from upp_tpu.models import build_model_from_cfg
    from upp_tpu.models.build import jit_init
    from upp_tpu.parallel.mesh import (fsdp_shardings, make_mesh, replicate,
                                       shard_batch)
    from upp_tpu.train.optim import build_optimizer
    from upp_tpu.train.runner_pretrain import make_pretrain_step
    from upp_tpu.train.state import TrainState
    from upp_tpu.utils.config import ConfigDict

    npoints, n_pts_ds, B = 64, 128, 8
    config = ConfigDict.from_nested({
        "model": {
            "NAME": "Point_MAE", "group_size": 8, "num_group": 16,
            "loss": "cdl2",
            "transformer_config": {
                "mask_ratio": 0.5, "mask_type": "rand", "trans_dim": 48,
                "encoder_dims": 48, "depth": 2, "drop_path_rate": 0.1,
                "num_heads": 4, "decoder_depth": 2, "decoder_num_heads": 4,
            },
        },
        "optimizer": {"type": "AdamW", "kwargs": {"lr": 1e-3, "weight_decay": 0.05}},
        "scheduler": {"type": "CosLR", "kwargs": {"epochs": 10, "initial_epochs": 1}},
        "npoints": npoints, "data_augmentation": "scale-translate",
    })
    model = build_model_from_cfg(config.model)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2), "mask": jax.random.key(3)}
    variables = dict(jit_init(model, rngs,
                              jnp.zeros((2, npoints, 3), jnp.float32),
                              deterministic=False))
    variables.setdefault("batch_stats", {})
    tx, _, _ = build_optimizer(config, variables["params"], steps_per_epoch=10,
                               peft_list=None)
    pts_h = np.random.default_rng(0).standard_normal(
        (B, n_pts_ds, 3)).astype(np.float32)

    results = {}
    for mode in ("replicated", "fsdp"):
        mesh = make_mesh(jax.devices()[:8])
        with mesh:
            fresh = jax.tree.map(jnp.array, variables)
            if mode == "fsdp":
                # min_size=128 so the tiny model's kernels actually shard
                place = lambda t: jax.device_put(
                    t, fsdp_shardings(mesh, t, min_size=128))
                params = place(fresh["params"])
                specs = {tuple(l.sharding.spec)
                         for l in jax.tree_util.tree_leaves(params)}
                assert any("data" in s for s in specs), \
                    "fsdp_shardings sharded nothing"
                opt_state = place(tx.init(fresh["params"]))
            else:
                params = replicate(mesh, fresh["params"])
                opt_state = replicate(mesh, tx.init(fresh["params"]))
            state = TrainState(params=params,
                               batch_stats=replicate(mesh, fresh["batch_stats"]),
                               opt_state=opt_state,
                               step=jnp.zeros((), jnp.int32))
            step = make_pretrain_step(model, tx, config)
            pts = shard_batch(mesh, jnp.asarray(pts_h))
            state, m = step(state, pts, jax.random.key(7))
            # second step: exercises the sharded opt_state round trip
            state, m = step(state, shard_batch(mesh, jnp.asarray(pts_h)),
                            jax.random.key(8))
            flat = jax.tree_util.tree_leaves(jax.device_get(state.params))
            results[mode] = (float(m["loss"]),
                             float(sum(np.abs(l).sum() for l in flat)))
    loss_r, p_r = results["replicated"]
    loss_f, p_f = results["fsdp"]
    np.testing.assert_allclose(loss_f, loss_r, rtol=5e-5)
    np.testing.assert_allclose(p_f, p_r, rtol=5e-5)


def test_tensor_parallel_step_matches_single_device():
    """dp×tp hybrid: the PEFT train step over a (data=4, model=2) mesh with
    Megatron-style column/row-parallel shardings on the scanned block stacks
    (parallel/mesh.tp_shardings) must reproduce the 1-device loss and updated
    params — the partitioner inserts the all-reduces; no model-code change."""
    import types

    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_cfg
    from upp_tpu.models import build_model_from_cfg
    from upp_tpu.models.build import jit_init
    from upp_tpu.parallel.mesh import (make_mesh, replicate, shard_batch,
                                       tp_shardings)
    from upp_tpu.train.optim import build_optimizer
    from upp_tpu.train.runner_cls import PEFT_LIST, make_train_step
    from upp_tpu.train.state import TrainState
    from upp_tpu.utils.config import ConfigDict

    point_num, n_pts_ds, B = 128, 512, 8
    config = ConfigDict.from_nested({
        "model": _flagship_cfg(tiny=True).to_plain(),
        "optimizer": {"type": "AdamW", "kwargs": {"lr": 5e-4, "weight_decay": 0.05}},
        "scheduler": {"type": "CosLR", "kwargs": {"epochs": 10, "initial_epochs": 1}},
        "dataset": {"train": {"_base_": {"N_POINTS": n_pts_ds}}},
        "npoints": point_num, "grad_norm_clip": 10,
        "noisy_train": True, "data_augmentation": "scale-translate",
    })
    args = types.SimpleNamespace(incomplete_cropping=True, noise=True,
                                 noise_type=("gaussian_noise", "lidar_noise"),
                                 normalize=False)
    model = build_model_from_cfg(config.model)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2)}
    variables = dict(jit_init(model, rngs,
                              jnp.zeros((2, point_num + 72, 3), jnp.float32),
                              completion_prompt=True, denoise=True,
                              point_num=point_num, deterministic=True))
    variables.setdefault("batch_stats", {})
    tx, _, _ = build_optimizer(config, variables["params"], steps_per_epoch=10,
                               peft_list=PEFT_LIST)
    pts_h = np.random.default_rng(0).standard_normal(
        (B, n_pts_ds, 3)).astype(np.float32)
    label_h = np.random.default_rng(1).integers(0, 6, B).astype(np.int32)

    results = {}
    for n_dev, mp in ((1, 1), (8, 2)):
        mesh = make_mesh(jax.devices()[:n_dev], model_parallel=mp)
        with mesh:
            fresh = jax.tree.map(jnp.array, variables)
            if mp > 1:
                params = jax.device_put(fresh["params"],
                                        tp_shardings(mesh, fresh["params"]))
                # moments inherit the param shardings
                opt_state = tx.init(params)
                sharded = [l for l in jax.tree_util.tree_leaves(params)
                           if len(getattr(l.sharding, "spec", ())) == 3]
                assert sharded, "tp_shardings sharded no stacked kernels"
            else:
                params = replicate(mesh, fresh["params"])
                opt_state = replicate(mesh, tx.init(fresh["params"]))
            state = TrainState(
                params=params,
                batch_stats=replicate(mesh, fresh["batch_stats"]),
                opt_state=opt_state,
                step=jnp.zeros((), jnp.int32))
            step = make_train_step(model, tx, config, args)
            pts = shard_batch(mesh, jnp.asarray(pts_h))
            label = shard_batch(mesh, jnp.asarray(label_h))
            state, m = step(state, pts, label, jax.random.key(7))
            flat = jax.tree_util.tree_leaves(jax.device_get(state.params))
            results[n_dev] = (float(m["loss"]),
                              float(sum(np.abs(l).sum() for l in flat)))
    loss1, p1 = results[1]
    loss8, p8 = results[8]
    np.testing.assert_allclose(loss8, loss1, rtol=5e-5)
    np.testing.assert_allclose(p8, p1, rtol=5e-5)
