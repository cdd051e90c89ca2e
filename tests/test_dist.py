"""Multi-device mesh coverage: the full PEFT train step over virtual CPU
meshes of several sizes (SURVEY.md §4e; the driver separately runs
dryrun_multichip(N))."""

import jax
import pytest


@pytest.mark.parametrize("n_devices", [2, 8])
def test_dryrun_multichip(n_devices):
    import __graft_entry__ as g
    g.dryrun_multichip(n_devices)


def test_shard_batch_multi_device():
    import jax.numpy as jnp
    from upp_tpu.parallel.mesh import make_mesh, shard_batch, replicate
    mesh = make_mesh(jax.devices()[:4])
    x = jnp.ones((8, 16, 3))
    xs = shard_batch(mesh, x)
    assert len(xs.sharding.device_set) == 4
    p = replicate(mesh, {"w": jnp.ones((3, 3))})
    assert len(p["w"].sharding.device_set) == 4
