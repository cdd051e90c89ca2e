"""Checkpoint save / resume (orbax).

Replaces ``tools/builder.py:91-163``: ``ckpt-best`` / ``ckpt-last`` per
experiment dir with {params, batch_stats, opt_state, epoch}; resume restores
epoch + weights + optimizer. Optimizer state (optax namedtuples) is serialized
as a flat leaf list and re-hung on the live treedef at restore, so exotic
optax structures round-trip."""

from __future__ import annotations

import os
import threading
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logger import print_log
from .state import TrainState

# one writer chain per checkpoint path; each entry carries the writer thread
# plus an error box so a failed background write surfaces on join instead of
# dying silently with the thread. A save issued while the path's writer is
# still busy does NOT block the training thread: it lands in _QUEUED
# (latest-wins — superseded snapshots are dropped, exactly what ckpt-last
# overwrite semantics mean) and the live writer picks it up when the current
# write finishes. Without this, per-epoch ckpt-last saves serialize the
# training loop at one device→host fetch per epoch (~30 s on the tunnel for
# 2-4 s synthetic epochs, observed in the round-5 rehearsal).
_PENDING: Dict[str, Tuple[threading.Thread, list]] = {}
_QUEUED: Dict[str, Any] = {}   # path -> newest not-yet-started write closure
_PENDING_LOCK = threading.Lock()


def _join_writer(t: threading.Thread, err_box: list, path: str) -> None:
    t.join()
    if err_box:
        raise RuntimeError(
            f"async checkpoint write to {path} failed") from err_box[0]


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _gather_leaf(x):
    """Fetch a leaf to host numpy, assembling non-addressable multi-host
    arrays: replicated leaves come from the first addressable shard;
    data-axis-SHARDED leaves (fsdp training) need a tiled process_allgather —
    a COLLECTIVE, so this must run synchronously on every process (never on
    the async writer thread)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        if x.sharding.is_fully_replicated:
            return np.asarray(x.addressable_data(0))
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def wait_for_pending_saves() -> None:
    """Block until every in-flight async checkpoint write has landed.

    Re-raises the first background-write failure (disk full, orbax error) so
    a run cannot finish while reporting checkpoints as saved that never were.
    """
    with _PENDING_LOCK:
        pending = dict(_PENDING)
        _PENDING.clear()
    for path, (t, err_box) in pending.items():
        _join_writer(t, err_box, path)


def save_checkpoint(state: TrainState, epoch: int, prefix: str,
                    experiment_path: str, metrics: Optional[Dict] = None,
                    logger=None, block: bool = False) -> None:
    """Write {params, opt_state, batch_stats, epoch, metrics} to
    ``<experiment_path>/<prefix>``.

    Default is ASYNCHRONOUS: the state is snapshotted on-device (cheap HBM
    copy, safe against the train step's buffer donation) and the
    host-transfer + orbax write run on a background thread — on a tunneled
    TPU the fetch alone is ~8-10 s, which would otherwise stall training
    every epoch (``tools/builder.py:127-136`` blocks the same way).
    ``block=True`` restores synchronous behaviour."""
    path = os.path.join(os.path.abspath(experiment_path), prefix)
    # snapshot: device-side copies detach the payload from donated buffers
    snap_params = jax.tree_util.tree_map(jnp.copy, state.params)
    snap_opt = [jnp.copy(x) for x in jax.tree_util.tree_leaves(state.opt_state)]
    snap_stats = (jax.tree_util.tree_map(jnp.copy, state.batch_stats)
                  if state.batch_stats else None)
    snap_step = jnp.copy(state.step)  # drives the per-step rng stream
    if jax.process_count() > 1:
        # multi-host: fetch synchronously on EVERY process (fsdp-sharded
        # leaves need a collective allgather, which cannot run on the writer
        # thread), and force a SYNCHRONOUS orbax save — orbax's save() is
        # itself a collective (it barriers on 'Checkpointer:save_start' and
        # writes from the primary host), so all ranks must call it at the
        # same point; detached writer threads could interleave two pending
        # saves in different orders across ranks and deadlock the barrier.
        snap_params = jax.tree_util.tree_map(_gather_leaf, snap_params)
        snap_opt = [_gather_leaf(x) for x in snap_opt]
        if snap_stats is not None:
            snap_stats = jax.tree_util.tree_map(_gather_leaf, snap_stats)
        snap_step = _gather_leaf(snap_step)
        block = True
    meta = {"epoch": int(epoch),
            # orbax rejects empty dict nodes — keep a sentinel entry
            "metrics": {str(k): float(v)
                        for k, v in (metrics or {}).items()} or {"_": 0.0}}

    err_box: list = []

    def write():
        try:
            payload = {"params": _to_numpy(snap_params),
                       "opt_leaves": [np.asarray(x) for x in snap_opt],
                       "step": int(np.asarray(snap_step)), **meta}
            if snap_stats is not None:
                payload["batch_stats"] = _to_numpy(snap_stats)
            _checkpointer().save(path, payload, force=True)
        except BaseException as e:  # surfaced on the next join of this path
            err_box.append(e)
            print_log(f"[CKPT] async save to {path} FAILED: {e!r}",
                      logger=logger)
            raise

    if block:
        # synchronous write: drain this path's chain first (never two
        # writers on one path; a queued older snapshot is superseded by
        # the state we are about to write, so it is dropped)
        with _PENDING_LOCK:
            prev = _PENDING.pop(path, None)
            _QUEUED.pop(path, None)
        if prev is not None:
            _join_writer(*prev, path)
        write()
        print_log(f"Save checkpoint at {path}", logger=logger)
        return

    with _PENDING_LOCK:
        if path in _PENDING:
            # writer chain busy on this path: coalesce — replace any
            # queued snapshot with this newer one and return immediately
            # (device-side snapshots are cheap; the fetch happens on the
            # writer thread when it picks this up). Errors are routed into
            # the CHAIN's error box so they surface on the next join.
            chain_box = _PENDING[path][1]

            def queued_write(w=write, box=chain_box):
                try:
                    w()
                except BaseException as e:
                    box.append(e)

            _QUEUED[path] = queued_write
        else:
            chain_box = err_box

            def chain_loop(first=write):
                w = first
                while True:
                    try:
                        w()
                    except BaseException:
                        pass  # already recorded in chain_box by write()
                    with _PENDING_LOCK:
                        nxt = _QUEUED.pop(path, None)
                        if nxt is None:
                            _PENDING.pop(path, None)
                            return
                    w = nxt

            t = threading.Thread(target=chain_loop, daemon=False)
            _PENDING[path] = (t, chain_box)
            t.start()
    print_log(f"Save checkpoint at {path}", logger=logger)


def resume_checkpoint(state: TrainState, experiment_path: str,
                      prefix: str = "ckpt-last", logger=None
                      ) -> Tuple[TrainState, int, Dict]:
    """Restore a TrainState saved by save_checkpoint; returns
    (state, start_epoch, metrics). Missing checkpoint → epoch 0."""
    wait_for_pending_saves()
    path = os.path.join(os.path.abspath(experiment_path), prefix)
    if not os.path.exists(path):
        print_log(f"[RESUME] no checkpoint at {path}", logger=logger)
        return state, 0, {}
    restored = _checkpointer().restore(path)
    treedef = jax.tree_util.tree_structure(state.opt_state)
    opt_leaves = [restored["opt_leaves"][str(i)] if isinstance(restored["opt_leaves"], dict)
                  else restored["opt_leaves"][i]
                  for i in range(treedef.num_leaves)]
    new_state = state.replace(
        params=restored["params"],
        batch_stats=restored.get("batch_stats") or {},
        opt_state=jax.tree_util.tree_unflatten(treedef, opt_leaves),
        # the global step drives the per-step rng stream
        # (train_step: fold_in(rng, state.step)); without it a resumed run
        # would REPLAY the epoch-0 noise/dropout stream. Older checkpoints
        # (pre round 3) lack the field — fall back to the fresh-state value.
        step=jnp.asarray(int(restored.get("step", jax.device_get(state.step))),
                         jnp.int32))
    start = int(restored["epoch"]) + 1
    print_log(f"[RESUME] restored ckpt @ epoch {restored['epoch']}", logger=logger)
    return new_state, start, dict(restored.get("metrics") or {})
