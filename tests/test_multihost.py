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


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_two_process(tmp_path, worker_src):
    worker = tmp_path / "worker.py"
    worker.write_text(worker_src)
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [subprocess.Popen([sys.executable, str(worker), str(i), str(port)],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              text=True, env=env, cwd=os.getcwd())
             for i in range(2)]
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
    accs = []
    for out, _ in outs:
        line = next(l for l in out.splitlines() if l.startswith("ACC_RESULT"))
        accs.append(float(line.split()[1]))
    assert accs[0] == accs[1]
    return accs[0]


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
    acc = _run_two_process(tmp_path, _WORKER)
    np.testing.assert_allclose(acc, _oracle_acc(), atol=1e-4)


def test_two_process_validate_jitted_multidevice(tmp_path):
    """2 processes x 4 local CPU devices with params committed to the GLOBAL
    8-device mesh and a jitted eval_step — exercises validate's
    host-local-replica placement (not just the gather)."""
    acc = _run_two_process(tmp_path, _WORKER_JIT)
    np.testing.assert_allclose(acc, _oracle_acc(), atol=1e-4)
