"""Async checkpoint writer: latest-wins coalescing per path.

Round-5 finding: per-epoch ckpt-last saves used to JOIN the previous
epoch's in-flight write before starting, serializing the training loop at
one device→host fetch per epoch (~30 s on the tunnel for 2-4 s synthetic
epochs). save_checkpoint now queues the newest snapshot (latest-wins) while
a writer is busy and returns immediately; the writer chain drains the queue.
These tests drive that logic with a slow stub checkpointer.
"""

import threading
import time

import jax.numpy as jnp
import numpy as np
import pytest

from upp_tpu.train import checkpoint as ckpt
from upp_tpu.train.state import TrainState


class _SlowStubCheckpointer:
    def __init__(self, log, delay, fail_on=()):
        self.log, self.delay, self.fail_on = log, delay, set(fail_on)

    def save(self, path, payload, force=False):
        time.sleep(self.delay)
        step = payload["step"]
        if step in self.fail_on:
            raise IOError(f"stub failure at step {step}")
        self.log.append((path, step))


def _state(step):
    return TrainState(params={"w": jnp.float32(step)}, batch_stats={},
                      opt_state=[jnp.float32(step)],
                      step=jnp.asarray(step, jnp.int32))


@pytest.fixture
def stub(monkeypatch):
    log = []
    holder = {"cp": _SlowStubCheckpointer(log, delay=0.15)}
    monkeypatch.setattr(ckpt, "_checkpointer", lambda: holder["cp"])
    yield log, holder
    ckpt.wait_for_pending_saves()


def test_rapid_saves_do_not_block_and_coalesce_latest_wins(stub, tmp_path):
    log, _ = stub
    t0 = time.perf_counter()
    for step in range(6):
        ckpt.save_checkpoint(_state(step), epoch=step, prefix="ckpt-last",
                             experiment_path=str(tmp_path), logger="silent")
    issue_time = time.perf_counter() - t0
    # 6 saves x 0.15 s writer delay: the training thread must NOT serialize
    # on the writes (old behavior: >= 5 x 0.15 s of joins)
    assert issue_time < 0.4, f"save_checkpoint blocked the caller: {issue_time:.2f}s"
    ckpt.wait_for_pending_saves()
    # first write always lands; superseded intermediates may be dropped;
    # the LAST state must always be the final write
    steps = [s for _, s in log]
    assert steps[0] == 0
    assert steps[-1] == 5
    assert len(steps) < 6          # coalescing actually dropped something
    assert steps == sorted(steps)  # never out of order on one path


def test_distinct_paths_do_not_coalesce(stub, tmp_path):
    log, _ = stub
    ckpt.save_checkpoint(_state(1), epoch=1, prefix="ckpt-best",
                         experiment_path=str(tmp_path), logger="silent")
    ckpt.save_checkpoint(_state(2), epoch=2, prefix="ckpt-last",
                         experiment_path=str(tmp_path), logger="silent")
    ckpt.wait_for_pending_saves()
    assert sorted(s for _, s in log) == [1, 2]
    assert len({p for p, _ in log}) == 2


def test_block_save_drains_chain_and_writes_synchronously(stub, tmp_path):
    log, _ = stub
    ckpt.save_checkpoint(_state(1), epoch=1, prefix="ckpt-last",
                         experiment_path=str(tmp_path), logger="silent")
    ckpt.save_checkpoint(_state(2), epoch=2, prefix="ckpt-last",
                         experiment_path=str(tmp_path), logger="silent")
    ckpt.save_checkpoint(_state(3), epoch=3, prefix="ckpt-last",
                         experiment_path=str(tmp_path), logger="silent",
                         block=True)
    # block=True returns only after ITS write landed, superseding any queue
    assert log[-1][1] == 3
    ckpt.wait_for_pending_saves()
    assert log[-1][1] == 3


def test_queued_write_failure_surfaces_on_join(stub, tmp_path):
    log, holder = stub
    holder["cp"] = _SlowStubCheckpointer(log, delay=0.15, fail_on={2})
    ckpt.save_checkpoint(_state(1), epoch=1, prefix="ckpt-last",
                         experiment_path=str(tmp_path), logger="silent")
    # queued while step-1 write is in flight; its failure must not vanish
    ckpt.save_checkpoint(_state(2), epoch=2, prefix="ckpt-last",
                         experiment_path=str(tmp_path), logger="silent")
    with pytest.raises(RuntimeError, match="async checkpoint write"):
        ckpt.wait_for_pending_saves()


def test_first_write_failure_surfaces_on_join(stub, tmp_path):
    log, holder = stub
    holder["cp"] = _SlowStubCheckpointer(log, delay=0.01, fail_on={7})
    ckpt.save_checkpoint(_state(7), epoch=7, prefix="ckpt-last",
                         experiment_path=str(tmp_path), logger="silent")
    with pytest.raises(RuntimeError, match="async checkpoint write"):
        ckpt.wait_for_pending_saves()
