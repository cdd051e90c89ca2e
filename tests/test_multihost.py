"""Multi-host eval gather: 2 real JAX processes over localhost exercising
``runner_cls.validate``'s process_allgather + dedup-by-index branch
(reference: ``utils/dist_utils.py:50-54`` gather_tensor + the runner's
dist-eval merge). The dataset size is chosen so shard padding DUPLICATES a
sample across hosts — the dedup must remove it from the metric."""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_WORKER = textwrap.dedent("""
    import sys
    pid, port = int(sys.argv[1]), sys.argv[2]
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                               process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from upp_tpu.data import BatchLoader, build_dataset_from_cfg
    from upp_tpu.parallel.mesh import make_mesh
    from upp_tpu.train.runner_cls import validate
    from upp_tpu.train.state import TrainState

    # SIZE=9 over 2 shards pads to 10 -> one sample is DUPLICATED across
    # hosts; dedup-by-index must keep the metric equal to the 9-sample truth
    ds = build_dataset_from_cfg(
        {"NAME": "Synthetic", "N_POINTS": 64, "NUM_CATEGORY": 4, "SIZE": 9},
        {"subset": "test"})
    loader = BatchLoader(ds, 4, shuffle=False, drop_last=False,
                         num_shards=2, shard_index=pid, prefetch=0)

    def eval_step(variables, pts):   # deterministic data-derived prediction
        return (jnp.floor(jnp.abs(pts[:, 0, 0]) * 10.0)).astype(jnp.int32) % 4

    state = TrainState(params={}, batch_stats={}, opt_state=None, step=0)
    mesh = make_mesh()
    m = validate(eval_step, state, loader, mesh, 0)
    print(f"ACC_RESULT {m.acc:.6f}")
""")


_WORKER_JIT = textwrap.dedent("""
    import os, sys
    pid, port = int(sys.argv[1]), sys.argv[2]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                               process_id=pid)
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4
    import jax.numpy as jnp
    import numpy as np
    from upp_tpu.data import BatchLoader, build_dataset_from_cfg
    from upp_tpu.parallel.mesh import make_mesh, replicate
    from upp_tpu.train.runner_cls import validate
    from upp_tpu.train.state import TrainState

    ds = build_dataset_from_cfg(
        {"NAME": "Synthetic", "N_POINTS": 64, "NUM_CATEGORY": 4, "SIZE": 9},
        {"subset": "test"})
    loader = BatchLoader(ds, 4, shuffle=False, drop_last=False,
                         num_shards=2, shard_index=pid, prefetch=0)

    # params committed to the GLOBAL 8-device mesh (as after dp training);
    # validate must pull a host-local replica before the jitted per-host eval
    gmesh = make_mesh()
    state = TrainState(params={"w": replicate(gmesh, jnp.float32(10.0))},
                       batch_stats={}, opt_state=None, step=0)

    @jax.jit
    def eval_step(variables, pts):
        w = variables["params"]["w"]
        return (jnp.floor(jnp.abs(pts[:, 0, 0]) * w)).astype(jnp.int32) % 4

    m = validate(eval_step, state, loader, gmesh, 0)
    print(f"ACC_RESULT {m.acc:.6f}")
""")


_WORKER_SEG = textwrap.dedent("""
    import os, sys
    pid, port = int(sys.argv[1]), sys.argv[2]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                               process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from upp_tpu.data import BatchLoader, build_dataset_from_cfg
    from upp_tpu.parallel.mesh import make_mesh, replicate
    from upp_tpu.train.runner_seg import validate
    from upp_tpu.train.state import TrainState

    # SIZE=9 over 2 shards pads -> one duplicated sample; dedup must drop it
    ds = build_dataset_from_cfg(
        {"NAME": "SyntheticPart", "N_POINTS": 32, "SIZE": 9},
        {"subset": "test"})
    loader = BatchLoader(ds, 4, shuffle=False, drop_last=False,
                         num_shards=2, shard_index=pid, prefetch=0)

    gmesh = make_mesh()
    state = TrainState(params={"w": replicate(gmesh, jnp.float32(3.0))},
                       batch_stats={}, opt_state=None, step=0)

    @jax.jit
    def eval_step(variables, pts, cls):
        w = variables["params"]["w"]
        q = jnp.argsort(jnp.argsort(pts[:, :, 0], axis=1), axis=1) / pts.shape[1]
        tgt = q * w * 10.0
        return -(jnp.arange(50.0)[None, None, :] - tgt[..., None]) ** 2

    m = validate(eval_step, state, loader, 0)
    print(f"SEG_RESULT {m['accuracy']:.6f} {m['class_avg_iou']:.6f} "
          f"{m['instance_avg_iou']:.6f}")
""")


_WORKER_PRETASK = textwrap.dedent("""
    import os, sys
    pid, port = int(sys.argv[1]), sys.argv[2]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                               process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from upp_tpu.data import BatchLoader, build_dataset_from_cfg
    from upp_tpu.parallel.mesh import make_mesh, replicate
    from upp_tpu.train.runner_pretask import validate
    from upp_tpu.train.state import TrainState

    # SIZE=8 splits evenly over 2 shards -> the global meter combine must
    # reproduce the single-process average exactly
    ds = build_dataset_from_cfg(
        {"NAME": "Synthetic", "N_POINTS": 64, "NUM_CATEGORY": 4, "SIZE": 8},
        {"subset": "test"})
    loader = BatchLoader(ds, 1, shuffle=False, drop_last=False,
                         num_shards=2, shard_index=pid, prefetch=0)

    gmesh = make_mesh()
    state = TrainState(params={"w": replicate(gmesh, jnp.float32(2.0))},
                       batch_stats={}, opt_state=None, step=0)

    @jax.jit
    def eval_step(variables, gt, vp):
        w = variables["params"]["w"]
        base = jnp.abs(gt).mean() * w + vp.sum()
        return {"sparse_l1": base, "sparse_l2": base * 2,
                "dense_l1": base * 3, "dense_l2": base * 4}

    m = validate(eval_step, state, loader, 0)
    print(f"PRETASK_RESULT {m.cd:.8f}")
""")


_WORKER_TRAIN = textwrap.dedent("""
    import os, sys
    pid, port = int(sys.argv[1]), sys.argv[2]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                               process_id=pid)
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4
    import jax.numpy as jnp
    import numpy as np
    from upp_tpu.models import build_model_from_cfg
    from upp_tpu.models.build import jit_init
    from upp_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from upp_tpu.train.optim import build_optimizer
    from upp_tpu.train.runner_pretrain import make_pretrain_step
    from upp_tpu.train.state import TrainState
    from upp_tpu.utils.config import ConfigDict

    config = ConfigDict.from_nested({
        "model": {"NAME": "Point_MAE", "group_size": 8, "num_group": 16,
                  "loss": "cdl2",
                  "transformer_config": {
                      "mask_ratio": 0.5, "mask_type": "rand", "trans_dim": 48,
                      "encoder_dims": 48, "depth": 2, "drop_path_rate": 0.0,
                      "num_heads": 4, "decoder_depth": 2,
                      "decoder_num_heads": 4}},
        "optimizer": {"type": "AdamW", "kwargs": {"lr": 1e-3,
                                                  "weight_decay": 0.05}},
        "scheduler": {"type": "CosLR", "kwargs": {"epochs": 10,
                                                  "initial_epochs": 1}},
        "npoints": 64, "data_augmentation": "scale-translate"})
    model = build_model_from_cfg(config.model)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2), "mask": jax.random.key(3)}
    variables = dict(jit_init(model, rngs, jnp.zeros((2, 96, 3), jnp.float32),
                              deterministic=False))
    variables.setdefault("batch_stats", {})
    tx, _, _ = build_optimizer(config, variables["params"],
                               steps_per_epoch=10, peft_list=None)
    mesh = make_mesh()
    with mesh:
        state = TrainState(params=replicate(mesh, variables["params"]),
                           batch_stats=replicate(mesh, variables["batch_stats"]),
                           opt_state=replicate(mesh, tx.init(variables["params"])),
                           step=jnp.zeros((), jnp.int32))
        step = make_pretrain_step(model, tx, config)
        # 3 global batches of 16; each host feeds its own 8-row shard
        data = np.random.default_rng(42).standard_normal(
            (3, 16, 96, 3)).astype(np.float32)
        for i in range(3):
            local = data[i, pid * 8:(pid + 1) * 8]
            state, m = step(state, shard_batch(mesh, jnp.asarray(local)),
                            jax.random.key(5))
        loss = float(np.asarray(m["loss"].addressable_data(0)))
        ck = float(sum(np.abs(np.asarray(l.addressable_data(0))).sum()
                       for l in jax.tree_util.tree_leaves(state.params)))
    print(f"TRAIN_RESULT {loss:.8f} {ck:.6f}")
""")


_WORKER_FSDP = textwrap.dedent("""
    import os, sys
    pid, port, ckpt_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                               process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from upp_tpu.models import build_model_from_cfg
    from upp_tpu.models.build import jit_init
    from upp_tpu.parallel.mesh import (fsdp_shardings, host_local_variables,
                                       make_mesh, replicate, shard_batch)
    from upp_tpu.train import checkpoint as ckpt
    from upp_tpu.train.optim import build_optimizer
    from upp_tpu.train.runner_pretrain import make_pretrain_step
    from upp_tpu.train.state import TrainState
    from upp_tpu.utils.config import ConfigDict

    config = ConfigDict.from_nested({
        "model": {"NAME": "Point_MAE", "group_size": 8, "num_group": 16,
                  "loss": "cdl2",
                  "transformer_config": {
                      "mask_ratio": 0.5, "mask_type": "rand", "trans_dim": 48,
                      "encoder_dims": 48, "depth": 2, "drop_path_rate": 0.0,
                      "num_heads": 4, "decoder_depth": 2,
                      "decoder_num_heads": 4}},
        "optimizer": {"type": "AdamW", "kwargs": {"lr": 1e-3,
                                                  "weight_decay": 0.05}},
        "scheduler": {"type": "CosLR", "kwargs": {"epochs": 10,
                                                  "initial_epochs": 1}},
        "npoints": 64, "data_augmentation": "scale-translate"})
    model = build_model_from_cfg(config.model)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2), "mask": jax.random.key(3)}
    variables = dict(jit_init(model, rngs, jnp.zeros((2, 96, 3), jnp.float32),
                              deterministic=False))
    variables.setdefault("batch_stats", {})
    tx, _, _ = build_optimizer(config, variables["params"],
                               steps_per_epoch=10, peft_list=None)
    # host copies: device_put can alias the source buffers, which the
    # donated train step would delete out from under the later rebuild
    pristine = jax.tree_util.tree_map(np.asarray, variables)
    mesh = make_mesh()
    with mesh:
        place = lambda t: jax.device_put(
            t, fsdp_shardings(mesh, t, min_size=128))
        state = TrainState(params=place(pristine["params"]),
                           batch_stats=replicate(mesh, pristine["batch_stats"]),
                           opt_state=place(tx.init(pristine["params"])),
                           step=jnp.zeros((), jnp.int32))
        sharded = [l for l in jax.tree_util.tree_leaves(state.params)
                   if not l.is_fully_addressable
                   and not l.sharding.is_fully_replicated]
        assert sharded, "fsdp placement sharded nothing across hosts"
        step = make_pretrain_step(model, tx, config)
        data = np.random.default_rng(7).standard_normal(
            (16, 96, 3)).astype(np.float32)
        state, m = step(state, shard_batch(mesh, data[pid * 8:(pid + 1) * 8]),
                        jax.random.key(5))

        # eval through a host-local replica of the SHARDED params
        variables_l = host_local_variables(
            {"params": state.params, "batch_stats": state.batch_stats})
        feats = model.apply(variables_l, jnp.asarray(data[:4, :64]),
                            eval_features=True, deterministic=True)
        f_ck = float(np.abs(np.asarray(feats)).sum())

        # checkpoint the SHARDED state (rank-0 write, collective gather),
        # then resume into a fresh fsdp-placed state and compare
        ckpt.save_checkpoint(state, 0, "ckpt-fsdp", ckpt_dir, block=False)
        ckpt.wait_for_pending_saves()
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("ckpt written")
        fresh = TrainState(params=place(pristine["params"]),
                           batch_stats=replicate(mesh, pristine["batch_stats"]),
                           opt_state=place(tx.init(pristine["params"])),
                           step=jnp.zeros((), jnp.int32))
        restored, epoch, _ = ckpt.resume_checkpoint(
            fresh, ckpt_dir, prefix="ckpt-fsdp")
        restored = restored.replace(params=place(restored.params),
                                    opt_state=place(restored.opt_state))
        ck_live = float(sum(
            np.abs(ckpt._gather_leaf(l)).sum()
            for l in jax.tree_util.tree_leaves(state.params)))
        ck_rest = float(sum(
            np.abs(ckpt._gather_leaf(l)).sum()
            for l in jax.tree_util.tree_leaves(restored.params)))
        # one more step on the RESUMED fsdp state proves the placement is live
        restored, m2 = step(restored,
                            shard_batch(mesh, data[pid * 8:(pid + 1) * 8]),
                            jax.random.key(6))
        loss2 = float(np.asarray(m2["loss"].addressable_data(0)))
    print(f"FSDP_RESULT {f_ck:.6f} {ck_live:.6f} {ck_rest:.6f} {loss2:.8f}")
""")


_WORKER_PRETASK_DETAIL = textwrap.dedent("""
    import io, sys
    from contextlib import redirect_stdout
    pid, port = int(sys.argv[1]), sys.argv[2]
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                               process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from upp_tpu.data import build_dataset_from_cfg
    from upp_tpu.train.runner_pretask import validate_detailed
    from upp_tpu.train.state import TrainState

    # SIZE=9 over 2 processes -> shards of 5 and 4; the gather pads the
    # short shard and dedup-by-index must drop the padding row
    ds = build_dataset_from_cfg(
        {"NAME": "Synthetic", "N_POINTS": 64, "NUM_CATEGORY": 3, "SIZE": 9},
        {"subset": "test"})
    state = TrainState(params={"w": jnp.float32(2.0)}, batch_stats={},
                       opt_state=None, step=0)

    def eval_step(variables, gt, vp):
        w = variables["params"]["w"]
        base = jnp.abs(gt).mean() * w + 0.01 * vp.sum()
        return {"sparse_l1": base, "sparse_l2": base * 2,
                "dense_l1": base * 3, "dense_l2": base * 4,
                "F-Score": base * 5, "CDL1": base * 6, "CDL2": base * 7}

    buf = io.StringIO()
    with redirect_stdout(buf):
        m = validate_detailed(eval_step, state, ds, 0, logger=None)
    flat = [m.cd]
    for line in buf.getvalue().splitlines():
        parts = line.split("\\t")
        if len(parts) >= 3 and parts[0] not in ("Taxonomy", "Overall"):
            flat += [float(parts[1])] + [float(v) for v in parts[2:] if v]
        elif parts[0] == "Overall":
            flat += [float(v) for v in parts[1:] if v]
    print("DETAIL_RESULT " + " ".join(f"{v:.8f}" for v in flat))
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_two_process(tmp_path, worker_src, prefix="ACC_RESULT",
                     extra_args=()):
    worker = tmp_path / "worker.py"
    worker.write_text(worker_src)
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [subprocess.Popen([sys.executable, str(worker), str(i), str(port),
                               *map(str, extra_args)],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              text=True, env=env, cwd=os.getcwd())
             for i in range(2)]
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
    vals = []
    for out, _ in outs:
        line = next(l for l in out.splitlines() if l.startswith(prefix))
        vals.append([float(v) for v in line.split()[1:]])
    np.testing.assert_allclose(vals[0], vals[1], rtol=1e-6)
    return vals[0]


def _oracle_acc():
    # single-process oracle over the full 9-sample set
    from upp_tpu.data import build_dataset_from_cfg
    ds = build_dataset_from_cfg(
        {"NAME": "Synthetic", "N_POINTS": 64, "NUM_CATEGORY": 4, "SIZE": 9},
        {"subset": "test"})
    hits = []
    for i in range(len(ds)):
        _, _, (pts, label) = ds[i]
        pred = int(np.floor(np.abs(pts[0, 0]) * 10.0)) % 4
        hits.append(pred == label)
    return float(np.mean(hits) * 100.0)


def test_two_process_validate_gather(tmp_path):
    acc = _run_two_process(tmp_path, _WORKER)[0]
    np.testing.assert_allclose(acc, _oracle_acc(), atol=1e-4)


def test_two_process_validate_jitted_multidevice(tmp_path):
    """2 processes x 4 local CPU devices with params committed to the GLOBAL
    8-device mesh and a jitted eval_step — exercises validate's
    host-local-replica placement (not just the gather)."""
    acc = _run_two_process(tmp_path, _WORKER_JIT)[0]
    np.testing.assert_allclose(acc, _oracle_acc(), atol=1e-4)


def test_two_process_fsdp_train_eval_checkpoint_resume(tmp_path):
    """FSDP (ZeRO-3) across 2 REAL processes: params sharded over the global
    data axis, one train step, eval through host_local_variables (must
    allgather the shards, not slice them), checkpoint save (collective gather
    + synchronous collective orbax write), resume + re-place + another live step. Both processes
    must agree on every number, and the restored params must equal the live
    ones."""
    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    f_ck, ck_live, ck_rest, loss2 = _run_two_process(
        tmp_path, _WORKER_FSDP, prefix="FSDP_RESULT",
        extra_args=[str(ckpt_dir)])
    np.testing.assert_allclose(ck_rest, ck_live, rtol=1e-7)
    assert np.isfinite(loss2) and np.isfinite(f_ck)
    assert (ckpt_dir / "ckpt-fsdp").exists()


def test_two_process_pretask_validate_matches_single_process(tmp_path):
    """runner_pretask.validate over 2 hosts: host-local params replica + the
    global CD-meter combine (sums+counts allgather) must reproduce the
    single-process average over the full set — the reference reports
    rank-local CD only."""
    cd_2p = _run_two_process(tmp_path, _WORKER_PRETASK,
                             prefix="PRETASK_RESULT")[0]

    import jax.numpy as jnp

    from upp_tpu.data import BatchLoader, build_dataset_from_cfg
    from upp_tpu.train.runner_pretask import validate
    from upp_tpu.train.state import TrainState

    ds = build_dataset_from_cfg(
        {"NAME": "Synthetic", "N_POINTS": 64, "NUM_CATEGORY": 4, "SIZE": 8},
        {"subset": "test"})
    loader = BatchLoader(ds, 1, shuffle=False, drop_last=False, prefetch=0)
    state = TrainState(params={"w": jnp.float32(2.0)}, batch_stats={},
                       opt_state=None, step=0)

    def eval_step(variables, gt, vp):
        w = variables["params"]["w"]
        base = jnp.abs(gt).mean() * w + vp.sum()
        return {"sparse_l1": base, "sparse_l2": base * 2,
                "dense_l1": base * 3, "dense_l2": base * 4}

    m = validate(eval_step, state, loader, 0)
    np.testing.assert_allclose(cd_2p, m.cd, rtol=1e-6)


def test_two_process_pretask_detailed_matches_single_process(tmp_path):
    """runner_pretask.validate_detailed over 2 processes (VERDICT r4 item 6):
    the sample sweep shards round-robin, gathers per-(sample, viewpoint)
    rows with padding dedup, and both processes must print the IDENTICAL
    full-set per-taxonomy table that a single process computes."""
    import io
    from contextlib import redirect_stdout

    import jax.numpy as jnp

    flat_2p = _run_two_process(tmp_path, _WORKER_PRETASK_DETAIL,
                               prefix="DETAIL_RESULT")

    from upp_tpu.data import build_dataset_from_cfg
    from upp_tpu.train.runner_pretask import validate_detailed
    from upp_tpu.train.state import TrainState

    ds = build_dataset_from_cfg(
        {"NAME": "Synthetic", "N_POINTS": 64, "NUM_CATEGORY": 3, "SIZE": 9},
        {"subset": "test"})
    state = TrainState(params={"w": jnp.float32(2.0)}, batch_stats={},
                       opt_state=None, step=0)

    def eval_step(variables, gt, vp):
        w = variables["params"]["w"]
        base = jnp.abs(gt).mean() * w + 0.01 * vp.sum()
        return {"sparse_l1": base, "sparse_l2": base * 2,
                "dense_l1": base * 3, "dense_l2": base * 4,
                "F-Score": base * 5, "CDL1": base * 6, "CDL2": base * 7}

    buf = io.StringIO()
    with redirect_stdout(buf):
        m = validate_detailed(eval_step, state, ds, 0, logger=None)
    flat_1p = [m.cd]
    for line in buf.getvalue().splitlines():
        parts = line.split("\t")
        if len(parts) >= 3 and parts[0] not in ("Taxonomy", "Overall"):
            flat_1p += [float(parts[1])] + [float(v) for v in parts[2:] if v]
        elif parts[0] == "Overall":
            flat_1p += [float(v) for v in parts[1:] if v]
    np.testing.assert_allclose(flat_2p, flat_1p, rtol=1e-5, atol=1e-8)


def test_two_process_seg_validate_matches_single_process(tmp_path):
    """runner_seg.validate over 2 hosts (host-local params replica, per-sample
    gather, shard-padding dedup) must equal the single-process sweep over the
    full set — the reference's seg validation is rank-local only."""
    seg_2p = _run_two_process(tmp_path, _WORKER_SEG, prefix="SEG_RESULT")

    import jax
    import jax.numpy as jnp

    from upp_tpu.data import BatchLoader, build_dataset_from_cfg
    from upp_tpu.train.runner_seg import validate
    from upp_tpu.train.state import TrainState

    ds = build_dataset_from_cfg(
        {"NAME": "SyntheticPart", "N_POINTS": 32, "SIZE": 9},
        {"subset": "test"})
    loader = BatchLoader(ds, 4, shuffle=False, drop_last=False, prefetch=0)
    state = TrainState(params={"w": jnp.float32(3.0)}, batch_stats={},
                       opt_state=None, step=0)

    def eval_step(variables, pts, cls):
        w = variables["params"]["w"]
        q = jnp.argsort(jnp.argsort(pts[:, :, 0], axis=1), axis=1) / pts.shape[1]
        tgt = q * w * 10.0
        return -(jnp.arange(50.0)[None, None, :] - tgt[..., None]) ** 2

    m = validate(eval_step, state, loader, 0)
    np.testing.assert_allclose(
        seg_2p, [m["accuracy"], m["class_avg_iou"], m["instance_avg_iou"]],
        atol=1e-6)


def test_two_process_train_step_matches_single_process(tmp_path):
    """2 hosts x 4 devices TRAINING over the global dp mesh: each host feeds
    its own 8-row loader shard through shard_batch (which must assemble the
    16-row GLOBAL batch via make_array_from_process_local_data — a plain
    device_put would silently shrink the batch to each host's addressable
    slice); 3 compounding full-param AdamW steps must produce the same loss
    and params as the single-process 8-device run on the concatenated
    batches. Replaces the reference's DDP gradient-allreduce trust
    (``utils/dist_utils.py:41-48``) with an executable equivalence check."""
    loss_2p, ck_2p = _run_two_process(tmp_path, _WORKER_TRAIN,
                                      prefix="TRAIN_RESULT")

    import jax
    import jax.numpy as jnp

    from upp_tpu.models import build_model_from_cfg
    from upp_tpu.models.build import jit_init
    from upp_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from upp_tpu.train.optim import build_optimizer
    from upp_tpu.train.runner_pretrain import make_pretrain_step
    from upp_tpu.train.state import TrainState
    from upp_tpu.utils.config import ConfigDict

    config = ConfigDict.from_nested({
        "model": {"NAME": "Point_MAE", "group_size": 8, "num_group": 16,
                  "loss": "cdl2",
                  "transformer_config": {
                      "mask_ratio": 0.5, "mask_type": "rand", "trans_dim": 48,
                      "encoder_dims": 48, "depth": 2, "drop_path_rate": 0.0,
                      "num_heads": 4, "decoder_depth": 2,
                      "decoder_num_heads": 4}},
        "optimizer": {"type": "AdamW", "kwargs": {"lr": 1e-3,
                                                  "weight_decay": 0.05}},
        "scheduler": {"type": "CosLR", "kwargs": {"epochs": 10,
                                                  "initial_epochs": 1}},
        "npoints": 64, "data_augmentation": "scale-translate"})
    model = build_model_from_cfg(config.model)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2), "mask": jax.random.key(3)}
    variables = dict(jit_init(model, rngs, jnp.zeros((2, 96, 3), jnp.float32),
                              deterministic=False))
    variables.setdefault("batch_stats", {})
    tx, _, _ = build_optimizer(config, variables["params"],
                               steps_per_epoch=10, peft_list=None)
    mesh = make_mesh(jax.devices()[:8])
    with mesh:
        state = TrainState(params=replicate(mesh, variables["params"]),
                           batch_stats=replicate(mesh, variables["batch_stats"]),
                           opt_state=replicate(mesh, tx.init(variables["params"])),
                           step=jnp.zeros((), jnp.int32))
        step = make_pretrain_step(model, tx, config)
        data = np.random.default_rng(42).standard_normal(
            (3, 16, 96, 3)).astype(np.float32)
        for i in range(3):
            state, m = step(state, shard_batch(mesh, jnp.asarray(data[i])),
                            jax.random.key(5))
        loss_1p = float(np.asarray(m["loss"]))
        ck_1p = float(sum(np.abs(np.asarray(l)).sum()
                          for l in jax.tree_util.tree_leaves(
                              jax.device_get(state.params))))

    np.testing.assert_allclose(loss_2p, loss_1p, rtol=1e-5)
    np.testing.assert_allclose(ck_2p, ck_1p, rtol=1e-5)
