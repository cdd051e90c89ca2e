"""Point-MAE self-supervised pretraining runner (``tools/runner_pretrain.py``):
FPS to npoints → scale/translate augment → Chamfer reconstruction loss, with
an SVM linear-probe validation over encoder features
(``runner_pretrain.py:49-53,203-262``).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import BatchLoader, build_dataset_from_cfg
from ..models import build_model_from_cfg
from ..ops.fps import fps
from ..parallel.mesh import (host_local_variables, make_mesh, replicate,
                             shard_batch)
from ..utils.logger import get_logger, print_log
from . import checkpoint as ckpt
from .metrics import AccMetric, AverageMeter
from .optim import build_optimizer
from .state import TrainState


def make_pretrain_step(model, tx, config):
    npoints = int(config.npoints)
    from .pipeline import resolve_augmentation
    aug_fn = resolve_augmentation(
        config.get("data_augmentation", "scale-translate"))

    def train_step(state: TrainState, pts, rng):
        ks = jax.random.split(jax.random.fold_in(rng, state.step), 4)
        points, _ = fps(pts, npoints)
        if aug_fn is not None:
            points = aug_fn(ks[0], points)

        def loss_fn(params):
            loss, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                points, deterministic=False,
                rngs={"dropout": ks[1], "droppath": ks[2], "mask": ks[3]},
                mutable=["batch_stats"])
            return loss, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (state.replace(params=params, batch_stats=new_stats,
                              opt_state=opt_state, step=state.step + 1),
                {"loss": loss})

    return jax.jit(train_step, donate_argnums=(0,))


def svm_probe(model, state, train_loader, val_loader, npoints: int,
              logger=None) -> float:
    """Linear SVM over frozen encoder features
    (``runner_pretrain.py:203-262``)."""
    from sklearn.svm import LinearSVC

    @jax.jit
    def features(variables, pts):
        points, _ = fps(pts, npoints)
        return model.apply(variables, points, eval_features=True,
                           deterministic=True)

    # multi-host: each host featurises its own loader shard with a host-local
    # replica of the params (global-mesh params would make jit demand
    # globally-addressable inputs; gather-aware for fsdp-sharded params),
    # then features are gathered across hosts before the fit — the reference
    # gathers rank features the same way (``runner_pretrain.py:245-249``).
    variables = host_local_variables(state.variables)

    def collect(loader):
        X, y = [], []
        for pts, label in loader:
            X.append(np.asarray(features(variables, jnp.asarray(pts))))
            y.append(label)
        X, y = np.concatenate(X), np.concatenate(y)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            # shard padding keeps per-host counts equal; the few padded
            # duplicates are harmless to an SVM fit (the reference's
            # DistributedSampler-padded gather has the same property)
            X = np.asarray(multihost_utils.process_allgather(
                jnp.asarray(X))).reshape(-1, X.shape[-1])
            y = np.asarray(multihost_utils.process_allgather(
                jnp.asarray(y))).reshape(-1)
        return X, y

    Xtr, ytr = collect(train_loader)
    Xte, yte = collect(val_loader)
    clf = LinearSVC(max_iter=2000)
    clf.fit(Xtr, ytr)
    acc = float((clf.predict(Xte) == yte).mean() * 100.0)
    print_log(f"[SVM probe] acc = {acc:.4f}", logger=logger)
    return acc


def run_net(args, config, train_writer=None, val_writer=None):
    logger = get_logger(getattr(args, "log_name", "upp_tpu"))
    mesh = make_mesh()
    n_proc, pid = jax.process_count(), jax.process_index()
    train_ds = build_dataset_from_cfg(config.dataset.train._base_,
                                      config.dataset.train.others)
    bs = int(config.dataset.train.others.bs)
    train_loader = BatchLoader(train_ds, bs, shuffle=True, drop_last=True,
                               seed=args.seed, num_shards=n_proc,
                               shard_index=pid)
    # SVM-probe loaders (runner_pretrain.py:58-60): ``extra_train`` provides
    # the probe's training features, ``val`` the held-out features. Probing
    # is gated on the extra_train split being configured, like the reference.
    val_loader = extra_loader = None
    if config.dataset.get("extra_train") and config.dataset.get("val"):
        extra_ds = build_dataset_from_cfg(config.dataset.extra_train._base_,
                                          config.dataset.extra_train.others)
        val_ds = build_dataset_from_cfg(config.dataset.val._base_,
                                        config.dataset.val.others)
        extra_loader = BatchLoader(extra_ds, bs, shuffle=False,
                                   num_shards=n_proc, shard_index=pid)
        val_loader = BatchLoader(val_ds, bs, shuffle=False,
                                 num_shards=n_proc, shard_index=pid)

    model = build_model_from_cfg(config.model)
    npoints = int(config.npoints)
    example = jnp.zeros((2, npoints, 3), jnp.float32)
    rngs = {"params": jax.random.key(args.seed), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2), "mask": jax.random.key(3)}
    from ..models.build import jit_init
    variables = dict(jit_init(model, rngs, example, deterministic=False))
    variables.setdefault("batch_stats", {})

    # warm start (runner_pretrain.py:74-78): --resume wins; otherwise
    # --start_ckpts (or --ckpts) loads weights via the format dispatch
    # (torch .pth shim or one of our own orbax checkpoint dirs)
    warm = getattr(args, "start_ckpts", None) or getattr(args, "ckpts", None)
    if not getattr(args, "resume", False) and warm:
        from .ckpt_io import load_weights
        variables, missing, unexpected = load_weights(
            variables, warm, logger=logger)
        print_log(f"[WARM START] loaded {warm} "
                  f"(missing={len(missing)}, unexpected={len(unexpected)})",
                  logger=logger)

    steps_per_epoch = max(len(train_loader), 1)
    tx, sched, mask = build_optimizer(config, variables["params"],
                                      steps_per_epoch, peft_list=None)
    if bool(config.get("fsdp", False)) and mesh.size > 1:
        # full-param training: shard params + Adam moments over the data
        # axis (ZeRO-3); GSPMD inserts the per-layer all-gathers and
        # gradient reduce-scatters. PEFT runners don't need this (§ mesh.py)
        from ..parallel.mesh import fsdp_shardings
        place = lambda t: jax.device_put(t, fsdp_shardings(mesh, t))
    else:
        place = lambda t: replicate(mesh, t)
    state = TrainState(params=place(variables["params"]),
                       batch_stats=replicate(mesh, variables["batch_stats"]),
                       opt_state=place(tx.init(variables["params"])),
                       step=jnp.zeros((), jnp.int32))
    start_epoch = 0
    best = AccMetric(0.0)
    if getattr(args, "resume", False):
        state, start_epoch, saved = ckpt.resume_checkpoint(
            state, args.experiment_path, logger=logger)
        best = AccMetric(saved.get("acc", 0.0))
        # re-establish the intended placement: resume hands back host arrays,
        # which would silently drop the ZeRO-3 sharding (full params + full
        # Adam moments back on every chip)
        state = state.replace(params=place(state.params),
                              opt_state=place(state.opt_state),
                              batch_stats=replicate(mesh, state.batch_stats))

    train_step = make_pretrain_step(model, tx, config)
    rng = jax.random.key(args.seed + 777)
    val_freq = max(int(getattr(args, "val_freq", 1) or 1), 1)

    for epoch in range(start_epoch, int(config.max_epoch) + 1):
        train_loader.set_epoch(epoch)
        meters = AverageMeter(["loss"])
        t0 = time.time()
        pending = []  # fetch once per epoch, keep the dispatch pipeline full
        for batch in train_loader:
            pts = shard_batch(mesh, np.asarray(batch[0]))
            state, m = train_step(state, pts, rng)
            pending.append(m)
        for m in jax.device_get(pending):
            meters.update([float(m["loss"]) * 1000])
        print_log("[Training] EPOCH: %d EpochTime = %.3f (s) LossX1000 = %.4f" %
                  (epoch, time.time() - t0, meters.avg(0)), logger=logger)
        if train_writer is not None:
            # epoch-level scalar (reference runner_pretrain.py:160-161,179
            # logs per batch; we fetch metrics once per epoch)
            train_writer.add_scalar("Loss/Epoch/Loss_1", meters.avg(0), epoch)
            train_writer.add_scalar("Loss/Epoch/LR",
                                    float(sched(epoch * steps_per_epoch)), epoch)

        if (extra_loader is not None and epoch % val_freq == 0 and epoch != 0):
            acc = svm_probe(model, state, extra_loader, val_loader, npoints,
                            logger=logger)
            print_log("[Validation] EPOCH: %d  acc = %.4f" % (epoch, acc),
                      logger=logger)
            if val_writer is not None:
                val_writer.add_scalar("Metric/ACC", acc, epoch)
            metrics = AccMetric(acc)
            if metrics.better_than(best):
                best = metrics
                ckpt.save_checkpoint(state, epoch, "ckpt-best",
                                        args.experiment_path,
                                        metrics=best.state_dict(),
                                        logger=logger)

        ckpt.save_checkpoint(state, epoch, "ckpt-last", args.experiment_path,
                                metrics=best.state_dict(), logger=logger)
        # periodic snapshots late in the run (runner_pretrain.py:192-194)
        if epoch % 25 == 0 and epoch >= 250:
            ckpt.save_checkpoint(state, epoch, f"ckpt-epoch-{epoch:03d}",
                                    args.experiment_path, logger=logger)
    ckpt.wait_for_pending_saves()
    return state
