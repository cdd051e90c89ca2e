"""Classification runners: PEFT/unify training (the primary UPP path), full
fine-tuning, and test/vote evaluation.

Re-implements ``tools/runner_module.py`` (run_net/validate/test_net/test_vote)
and ``tools/runner_finetune.py``. The entire per-batch computation — crop →
noise → augment → 3-pass prompted model → CE loss → masked AdamW update — is
ONE jitted, donated train step over a batch-sharded mesh; the host only feeds
raw [B, N_POINTS, 3] clouds and reads scalar meters.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import BatchLoader, build_dataset_from_cfg
from ..models import build_model_from_cfg
from ..ops.fps import fps
from ..ops.corrupt import normalize_unit_sphere, scale_translate
from ..parallel.mesh import (host_local_variables, make_mesh, replicate,
                             shard_batch)
from ..utils.logger import get_logger, print_log
from . import checkpoint as ckpt
from .metrics import AccMetric, AverageMeter, cross_entropy_loss_acc
from .optim import build_optimizer, count_params
from .pipeline import corrupt_batch, subsample_fps_random
from .state import TrainState
from .ckpt_io import load_weights, report_load

# PEFT trainable-name lists (tools/runner_module.py:62-66, 230-244)
PEFT_LIST = ["downstream_adapter", "downstream_adapter1", "downstream_prompts",
             "bnorm", "cls_pos", "cls_token", "cls_head_finetune"]
JOINT_PEFT_LIST = ["downstream_adapter", "downstream_adapter1",
                   "downstream_prompts", "dense_pred", "mask_token",
                   "rectify_prompter", "shape_pred", "coarse_pred",
                   "predict_token_generator", "mask_prompter",
                   "mask_token_generator"]


def build_loaders(args, config):
    train_ds = build_dataset_from_cfg(config.dataset.train._base_,
                                      config.dataset.train.others)
    val_ds = build_dataset_from_cfg(config.dataset.val._base_,
                                    config.dataset.val.others)
    n_proc, pid = jax.process_count(), jax.process_index()
    train_loader = BatchLoader(train_ds, config.dataset.train.others.bs,
                               shuffle=True, drop_last=True, seed=args.seed,
                               num_shards=n_proc, shard_index=pid)
    val_loader = BatchLoader(val_ds, config.dataset.val.others.bs,
                             shuffle=False, drop_last=False,
                             num_shards=n_proc, shard_index=pid)
    return train_loader, val_loader


def init_model(args, config, example_points, logger=None, peft=True):
    """Build + init the model; returns (model, variables)."""
    model = build_model_from_cfg(config.model)
    rngs = {"params": jax.random.key(args.seed), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2), "mask": jax.random.key(3)}
    # init through the FULL prompted path regardless of noisy_train: torch
    # creates every module in __init__, so the param tree must not depend on
    # which paths the config exercises (noisy_train=False with
    # noisy_validate=True used to leave the prompter params uncreated and
    # crash the first validate with ScopeParamNotFound)
    from ..models.build import jit_init
    variables = jit_init(model, rngs, example_points, completion_prompt=True,
                         denoise=True, point_num=int(config.npoints),
                         deterministic=True)
    variables = dict(variables)
    variables.setdefault("batch_stats", {})
    if getattr(args, "ckpts", None):
        variables, missing, unexpected = load_weights(
            variables, args.ckpts, logger=logger)
        report_load(missing, unexpected, logger=logger)
    else:
        print_log("Training from scratch", logger=logger)
    return model, variables


def make_train_step(model, tx, config, args):
    noisy_train = bool(config.get("noisy_train", False))
    npoints = int(config.npoints)
    n_pts_ds = int(config.dataset.train._base_.N_POINTS)
    aug = config.get("data_augmentation", None)

    def train_step(state: TrainState, pts, label, rng):
        # rng is an epoch-constant base key; derive the per-step stream inside
        # the jit from state.step (an eager host-side split costs a ~100 ms
        # tunnel round trip per batch on remote backends)
        rng = jax.random.fold_in(rng, state.step)
        k_pipe, k_drop, k_path = jax.random.split(rng, 3)
        points = corrupt_batch(
            k_pipe, pts, npoints=npoints, n_points_dataset=n_pts_ds,
            noisy_train=noisy_train,
            incomplete_cropping=bool(getattr(args, "incomplete_cropping", True)),
            add_noise=bool(getattr(args, "noise", True)),
            noise_types=tuple(getattr(args, "noise_type",
                                      ("gaussian_noise", "lidar_noise"))),
            augmentation=aug,
            normalize=bool(getattr(args, "normalize", False)))

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                points, completion_prompt=noisy_train, denoise=noisy_train,
                point_num=npoints, deterministic=False,
                rngs={"dropout": k_drop, "droppath": k_path},
                mutable=["batch_stats"])
            loss, acc = cross_entropy_loss_acc(out, label)
            return loss, (acc, mut["batch_stats"])

        (loss, (acc, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=params, batch_stats=new_stats,
                                  opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": loss, "acc": acc}

    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(model, config, args):
    npoints = int(config.npoints)
    noisy_validate = bool(config.get("noisy_validate", False))

    def eval_step(variables, pts):
        points, _ = fps(pts, npoints)
        if getattr(args, "normalize", False):
            points = normalize_unit_sphere(points)
        logits = model.apply(variables, points,
                             completion_prompt=noisy_validate,
                             denoise=noisy_validate, point_num=npoints,
                             deterministic=True)
        return jnp.argmax(logits, axis=-1)

    return jax.jit(eval_step)


def validate(eval_step, state, loader, mesh, epoch, logger=None) -> AccMetric:
    preds, labels, idxs = [], [], []
    # multi-process: each host evaluates its loader shard on its OWN devices
    # (a global-mesh device_put of process-local data is not addressable);
    # the per-sample results are gathered across hosts below.
    # host_local_variables is a no-op single-process and gather-aware for
    # fsdp-sharded params (parallel/mesh.py).
    variables = host_local_variables(state.variables)
    if jax.process_count() > 1:
        local = jax.local_devices()
        place_mesh = make_mesh(local) if len(local) > 1 else None
    else:
        place_mesh = mesh
    it = loader.iter_indexed() if hasattr(loader, "iter_indexed") else (
        (None, b) for b in loader)
    for idx, (pts, label) in it:
        pts_d = shard_batch(place_mesh, np.asarray(pts)) \
            if place_mesh is not None and pts.shape[0] % place_mesh.size == 0 \
            else jnp.asarray(pts)
        # keep predictions on device until the end of the sweep: a per-batch
        # fetch costs a full host<->device round trip on tunneled backends
        preds.append(eval_step(variables, pts_d))
        labels.append(label)
        if idx is not None:
            idxs.append(idx)
    if not preds:   # empty shard on this host
        preds = np.zeros((0,), np.int64)
        labels = [np.zeros((0,), np.int64)]
    else:
        preds = np.concatenate([np.asarray(p) for p in jax.device_get(preds)])
    labels = np.concatenate(labels)
    hit = (preds == labels)
    # synthetic fallback indices must be globally unique — identical
    # per-host aranges would make the post-gather dedup keep only one
    # host's shard
    idx = (np.concatenate(idxs) if idxs
           else np.arange(len(labels), dtype=np.int64)
           + jax.process_index() * (np.int64(1) << 40))
    if jax.process_count() > 1:
        # gather per-sample (hit, index) pairs across hosts (the reference's
        # dist_utils.gather_tensor); shard padding keeps sizes equal
        from jax.experimental import multihost_utils
        hit = np.asarray(multihost_utils.process_allgather(
            jnp.asarray(hit))).reshape(-1)
        idx = np.asarray(multihost_utils.process_allgather(
            jnp.asarray(idx))).reshape(-1)
    # drop shard-padding duplicates AFTER the gather (a duplicate may live on
    # a different host than the original) so they don't bias the metric
    _, keep = np.unique(idx, return_index=True)
    hit = hit[keep]
    acc = float(hit.mean() * 100.0) if hit.size else 0.0
    print_log(f"[Validation] EPOCH: {epoch}  acc = {acc:.4f}", logger=logger)
    return AccMetric(acc)


def run_net(args, config, train_writer=None, val_writer=None):
    """PEFT/unify classification training (``runner_module.run_net``)."""
    logger = get_logger(getattr(args, "log_name", "upp_tpu"))
    mesh = make_mesh()
    train_loader, val_loader = build_loaders(args, config)

    npoints = int(config.npoints)
    bs = int(config.dataset.train.others.bs)
    noisy = bool(config.get("noisy_train", False))
    n_train_pts = int(config.dataset.train._base_.N_POINTS)
    # model input shape after crop+noise
    n_model_in = npoints
    if noisy:
        if getattr(args, "noise", True):
            noise_types = getattr(args, "noise_type", ("gaussian_noise", "lidar_noise"))
            from .pipeline import GAUSSIAN_NOISE_NUMBER, LIDAR_NOISE_NUMBER
            if "lidar_noise" in noise_types:
                n_model_in += LIDAR_NOISE_NUMBER
            if "gaussian_noise" in noise_types:
                n_model_in += GAUSSIAN_NOISE_NUMBER

    example = jnp.zeros((2, n_model_in, 3), jnp.float32)
    model, variables = init_model(args, config, example, logger=logger)

    steps_per_epoch = max(len(train_loader), 1)
    peft = PEFT_LIST if getattr(args, "peft_model", True) else None
    tx, sched, mask = build_optimizer(config, variables["params"],
                                      steps_per_epoch, peft_list=peft)
    trainable, total = count_params(variables["params"], mask)
    print_log(f"# TrainableParams: {trainable/1e6:.2f} M / {total/1e6:.2f} M "
              f"({trainable/total*100:.2f} %)", logger=logger)

    state = TrainState(params=replicate(mesh, variables["params"]),
                       batch_stats=replicate(mesh, variables["batch_stats"]),
                       opt_state=replicate(mesh, tx.init(variables["params"])),
                       step=jnp.zeros((), jnp.int32))

    start_epoch = 0
    best = AccMetric(0.0)
    if getattr(args, "resume", False):
        state, start_epoch, saved = ckpt.resume_checkpoint(
            state, args.experiment_path, logger=logger)
        best = AccMetric(saved.get("acc", 0.0))

    train_step = make_train_step(model, tx, config, args)
    eval_step = make_eval_step(model, config, args)
    rng = jax.random.key(args.seed + 777)

    metrics = validate(eval_step, state, val_loader, mesh, 0, logger=logger)

    # NOTE: `or -1` would silently discard epoch 0 (0 is falsy) — the
    # reference's `args.joint_optimization == epoch` accepts it
    _jo = getattr(args, "joint_optimization", None)
    joint_epoch = int(_jo) if _jo is not None else -1

    def apply_joint_switch(state):
        """Swap to the joint trainable set (runner_module.py:228-242).

        The reference flips requires_grad in-place without touching the
        optimizer, so Adam moments of params that stay trainable survive.
        The AdamW chain's state structure is mask-independent, so we swap the
        transform and KEEP the live opt_state; Adam/SGD use multi_transform,
        whose state structure follows the mask, so their opt_state must be
        re-initialised (fresh moments — no shipped joint-opt config uses
        them)."""
        nonlocal tx, sched, mask, train_step
        print_log("[joint optimization] switching trainable set", logger=logger)
        tx, sched, mask = build_optimizer(config, variables["params"],
                                          steps_per_epoch,
                                          peft_list=JOINT_PEFT_LIST)
        train_step = make_train_step(model, tx, config, args)
        if config.optimizer.type != "AdamW":
            state = state.replace(opt_state=jax.jit(tx.init)(state.params))
        return state

    # a resumed run that is already past the switch epoch must not fall back
    # to the pre-joint trainable set (the `epoch == joint_epoch` trigger
    # below would never fire again; the reference has the same resume defect)
    if 0 <= joint_epoch < start_epoch:
        state = apply_joint_switch(state)

    max_epoch = int(config.max_epoch)
    for epoch in range(start_epoch, max_epoch + 1):
        train_loader.set_epoch(epoch)
        losses = AverageMeter(["loss", "acc"])
        t0 = time.time()
        # LR is a per-epoch constant (per-epoch stepping, builder.py:66-75);
        # resolve it once on the host instead of a device call per batch
        lr_epoch = float(sched(epoch * steps_per_epoch))
        # keep per-batch metrics as device arrays and fetch with a bounded
        # lag: a per-batch float() costs a full host<->device round trip
        # (~24 ms on tunneled backends), serialising the dispatch pipeline,
        # while a whole-epoch pending list hides divergence for an entire
        # epoch of dispatched steps. A lag window keeps the pipeline full
        # AND bounds NaN-detection latency to FETCH_LAG steps.
        FETCH_LAG = 16
        pending = []

        def drain(batch_idx, m):
            m = jax.device_get(m)
            loss_v, acc_v = float(m["loss"]), float(m["acc"])
            if not np.isfinite(loss_v):
                print_log(f"[DIVERGED] non-finite loss at epoch {epoch} "
                          f"step {batch_idx}: {loss_v}", logger=logger)
            losses.update([loss_v, acc_v])
            if train_writer is not None:
                n_itr = epoch * steps_per_epoch + batch_idx
                train_writer.add_scalar("Loss/Batch/Loss", loss_v, n_itr)
                train_writer.add_scalar("Loss/Batch/TrainAcc", acc_v, n_itr)
                train_writer.add_scalar("Loss/Batch/LR", lr_epoch, n_itr)

        for batch_idx, (pts, label) in enumerate(train_loader):
            # loader arrays go to shard_batch as host numpy: a jnp.asarray
            # here would add a device round trip before the multi-process
            # global-batch assembly (and an extra reshard single-process)
            batch = shard_batch(mesh, (pts, np.asarray(label)))
            state, m = train_step(state, batch[0], batch[1], rng)
            pending.append((batch_idx, m))
            if len(pending) > FETCH_LAG:
                drain(*pending.pop(0))
        for item in pending:
            drain(*item)

        if epoch == joint_epoch:
            state = apply_joint_switch(state)

        print_log("[Training] EPOCH: %d EpochTime = %.3f (s) Losses = %s" %
                  (epoch, time.time() - t0,
                   ["%.4f" % v for v in losses.avg()]), logger=logger)
        if train_writer is not None:
            train_writer.add_scalar("Loss/Epoch/Loss", losses.avg(0), epoch)

        if epoch % max(int(getattr(args, "val_freq", 1)), 1) == 0 and epoch != 0:
            metrics = validate(eval_step, state, val_loader, mesh, epoch,
                               logger=logger)
            if val_writer is not None:
                val_writer.add_scalar("Metric/ACC", metrics.acc, epoch)
            if metrics.better_than(best):
                best = metrics
                ckpt.save_checkpoint(state, epoch, "ckpt-best",
                                        args.experiment_path,
                                        metrics=metrics.state_dict(), logger=logger)
        ckpt.save_checkpoint(state, epoch, "ckpt-last", args.experiment_path,
                                metrics=metrics.state_dict(), logger=logger)
    ckpt.wait_for_pending_saves()
    return best


def finetune_run_net(args, config, train_writer=None, val_writer=None):
    """Full fine-tuning (``tools/runner_finetune.py``): same loop with all
    params trainable (peft_model=False path)."""
    args.peft_model = False
    return run_net(args, config, train_writer, val_writer)


def test_net(args, config):
    """Checkpoint evaluation (``runner_module.test_net`` /
    ``runner_finetune.test_net``)."""
    logger = get_logger(getattr(args, "log_name", "upp_tpu"))
    mesh = make_mesh()
    test_ds = build_dataset_from_cfg(config.dataset.test._base_,
                                     config.dataset.test.others)
    loader = BatchLoader(test_ds, config.dataset.test.others.bs)

    npoints = int(config.npoints)
    example = jnp.zeros((2, npoints + 72, 3), jnp.float32)
    model, variables = init_model(args, config, example, logger=logger)
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=None, step=jnp.zeros((), jnp.int32))
    eval_step = make_eval_step(model, config, args)
    metrics = validate(eval_step, state, loader, mesh, 0, logger=logger)
    print_log(f"[TEST] acc = {metrics.acc:.4f}", logger=logger)
    if getattr(args, "vote", False):
        acc = test_vote(model, state, loader, config, args, logger=logger)
        print_log(f"[TEST_VOTE] acc = {acc:.4f}", logger=logger)
    return metrics


def test_vote(model, state, loader, config, args, times: int = 10, logger=None):
    """10× FPS-resample + scale-translate vote (``runner_module.py:427-490``)."""
    npoints = int(config.npoints)

    @jax.jit
    def vote_logits(variables, pts, rng, vote_idx):
        k1, k2 = jax.random.split(jax.random.fold_in(rng, vote_idx))
        points = subsample_fps_random(k1, pts, npoints)
        points = scale_translate(k2, points)
        return model.apply(variables, points, deterministic=True)

    rng = jax.random.key(args.seed + 4242)
    pending, labels, idxs = [], [], []
    variables = host_local_variables(state.variables)
    vote_idx = 0
    it = (loader.iter_indexed() if hasattr(loader, "iter_indexed")
          else ((None, b) for b in loader))
    for idx, (pts, label) in it:
        pts = jnp.asarray(pts)
        acc_logits = None
        for _ in range(times):
            vote_idx += 1
            logits = vote_logits(variables, pts, rng, np.int32(vote_idx))
            acc_logits = logits if acc_logits is None else acc_logits + logits
        # keep on device until the sweep ends (per-batch fetch = RT stall)
        pending.append(jnp.argmax(acc_logits, -1))
        labels.append(label)
        if idx is not None:
            idxs.append(idx)
    preds = np.concatenate([np.asarray(p) for p in jax.device_get(pending)])
    labels = np.concatenate(labels)
    hit = preds == labels
    if jax.process_count() > 1:
        # gather per-sample hits and drop shard-padding duplicates, as in
        # validate() (reference test_vote gathers too, runner_module.py:470)
        from jax.experimental import multihost_utils
        idx = (np.concatenate(idxs) if idxs
               else np.arange(len(labels), dtype=np.int64)
               + jax.process_index() * (np.int64(1) << 40))
        hit = np.asarray(multihost_utils.process_allgather(
            jnp.asarray(hit))).reshape(-1)
        idx = np.asarray(multihost_utils.process_allgather(
            jnp.asarray(idx))).reshape(-1)
        _, keep = np.unique(idx, return_index=True)
        hit = hit[keep]
    return float(hit.mean() * 100.0) if hit.size else 0.0
