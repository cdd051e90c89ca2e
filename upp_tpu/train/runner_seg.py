"""Part-segmentation runners (``tools/runner_unify_seg.py`` and
``tools/runner_finetune_seg.py``): ShapeNetPart training with one-hot class
conditioning, online crop (25%, kept at its natural 1536-point size) +
gaussian 24 + lidar 64 noise, NLL loss over per-point log-probs, and the
accuracy / class-avg / instance-avg mIoU validation suite.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import BatchLoader, build_dataset_from_cfg
from ..data.partnormal import SEG_CLASSES
from ..models import build_model_from_cfg
from ..ops.corrupt import (gaussian_shell_noise, lidar_noise,
                           separate_point_cloud)
from ..parallel.mesh import (host_local_variables, make_mesh, replicate,
                             shard_batch)
from ..utils.logger import get_logger, print_log
from . import checkpoint as ckpt
from .metrics import AverageMeter, nll_seg_loss, seg_miou_metrics
from .optim import build_optimizer, count_params
from .state import TrainState

# tools/runner_unify_seg.py:143-146
SEG_PEFT_LIST = ["downstream_adapter", "downstream_prompts", "label_conv",
                 "propagation_0", "seg_head", "propagation_1"]
NUM_CLASSES = 16
GAUSSIAN_NUM = 24   # runner_unify_seg.py:218
LIDAR_NUM = 64      # runner_unify_seg.py:221


def to_categorical(y: jnp.ndarray, num_classes: int = NUM_CLASSES) -> jnp.ndarray:
    return jax.nn.one_hot(y, num_classes, dtype=jnp.float32)


def make_seg_train_step(model, tx, config, args, unify: bool):
    n_pts_ds = int(config.dataset.train._base_.N_POINTS)
    num_crop = int(n_pts_ds * 0.25)
    from .pipeline import resolve_augmentation
    aug_fn = resolve_augmentation(config.get("data_augmentation", None))
    noisy = bool(config.get("noisy_train", False))
    deviation = float(getattr(args, "deviation", 0.1))
    noise_radius = float(getattr(args, "noise_radius", 0.8))

    def train_step(state: TrainState, pts, cls_label, target, rng):
        ks = jax.random.split(jax.random.fold_in(rng, state.step), 6)
        if aug_fn is not None:
            pts = aug_fn(ks[0], pts)
        gt_points = pts
        one_hot = to_categorical(cls_label)

        if unify and noisy:
            partial, _ = separate_point_cloud(ks[1], pts, num_crop,
                                              resample=False)
            points = partial
            B, P, _ = points.shape
            g = gaussian_shell_noise(ks[2], (B, GAUSSIAN_NUM, 3), loc=0.0,
                                     scale=deviation, shell_radius=noise_radius)
            points = jnp.concatenate([points, g], axis=1)
            l = lidar_noise(ks[3], points, LIDAR_NUM, low=1.2, scale=1.5)
            points = jnp.concatenate([points, l], axis=1)
        else:
            points = pts
            P = pts.shape[1]

        def loss_fn(params):
            kwargs = dict(deterministic=False,
                          rngs={"dropout": ks[4], "droppath": ks[5]},
                          mutable=["batch_stats"])
            if unify:
                out, mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    points, one_hot, gt_points, completion_prompt=noisy,
                    denoise=noisy, point_num=P, **kwargs)
            else:
                out, mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    points, one_hot, gt_points, **kwargs)
            loss = nll_seg_loss(out, target)
            acc = jnp.mean((jnp.argmax(out, -1) == target).astype(jnp.float32))
            return loss, (acc, mut["batch_stats"])

        (loss, (acc, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (state.replace(params=params, batch_stats=new_stats,
                              opt_state=opt_state, step=state.step + 1),
                {"loss": loss, "acc": acc * 100})

    return jax.jit(train_step, donate_argnums=(0,))


def make_seg_eval_step(model, config, unify: bool):
    def eval_step(variables, pts, cls_label):
        one_hot = to_categorical(cls_label)
        if unify:
            return model.apply(variables, pts, one_hot,
                               completion_prompt=False, denoise=False,
                               point_num=pts.shape[1], deterministic=True)
        return model.apply(variables, pts, one_hot, deterministic=True)

    return jax.jit(eval_step)


def validate(eval_step, state, loader, epoch, logger=None):
    """(``runner_unify_seg.py:300-368``): per-object argmax restricted to the
    object's category part range, then the mIoU suite.

    Multi-host: each host evaluates its loader shard with a host-local
    replica of the params (global-mesh params would make the jitted step
    demand globally-addressable inputs), then per-sample (pred, target, cls,
    index) rows are gathered across hosts and shard-padding duplicates
    dropped by index — the reference computes per-RANK mIoU only
    (``runner_unify_seg.py:300-368`` has no gather; rank 0 reports 1/world
    of the val set)."""
    variables = host_local_variables(state.variables)
    all_preds, all_targets, all_cls, idxs = [], [], [], []
    cat_names = list(SEG_CLASSES.keys())
    label_to_cat = {p: c for c, parts in SEG_CLASSES.items() for p in parts}
    # dispatch a small window ahead, fetching with a lag of FETCH_LAG batches:
    # keeps the pipeline full without retaining the whole sweep's dense
    # [B, npoints, 50] logits in HBM
    FETCH_LAG = 4
    pending: list = []

    def drain(logits_batch, seg):
        logits = np.asarray(logits_batch)
        preds = np.zeros(seg.shape, np.int32)
        for i in range(seg.shape[0]):
            cat = label_to_cat[int(seg[i, 0])]
            parts = SEG_CLASSES[cat]
            preds[i] = np.argmax(logits[i][:, parts], axis=1) + parts[0]
        all_preds.append(preds)

    it = (loader.iter_indexed() if hasattr(loader, "iter_indexed")
          else ((None, b) for b in loader))
    for idx, (pts, cls, seg) in it:
        pending.append((eval_step(variables, jnp.asarray(pts),
                                  jnp.asarray(cls)), seg))
        all_targets.append(seg)
        all_cls.append(cls)
        if idx is not None:
            idxs.append(idx)
        if len(pending) > FETCH_LAG:
            drain(*pending.pop(0))
    for item in pending:
        drain(*item)
    preds = np.concatenate(all_preds)
    targets = np.concatenate(all_targets)
    cls_arr = np.concatenate(all_cls)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        # synthetic fallback indices offset per process so dedup keeps
        # every host's shard
        idx = (np.concatenate(idxs) if idxs
               else np.arange(len(targets), dtype=np.int64)
               + jax.process_index() * (np.int64(1) << 40))
        gathered = [np.asarray(multihost_utils.process_allgather(
            jnp.asarray(a))) for a in (preds, targets, cls_arr, idx)]
        preds, targets, cls_arr, idx = [
            a.reshape((-1,) + a.shape[2:]) for a in gathered]
        _, keep = np.unique(idx, return_index=True)
        preds, targets, cls_arr = preds[keep], targets[keep], cls_arr[keep]
    m = seg_miou_metrics(preds, targets, cls_arr, SEG_CLASSES)
    # per-category table, reference format (runner_unify_seg.py:363-364)
    for cat in sorted(m["per_category_iou"]):
        print_log("eval mIoU of %s %f" % (cat + " " * (14 - len(cat)),
                                          m["per_category_iou"][cat]),
                  logger=logger)
    print_log("Epoch %d test Accuracy: %f  Class avg mIOU: %f  "
              "Instance avg mIOU: %f" %
              (epoch, m["accuracy"] * 100, m["class_avg_iou"] * 100,
               m["instance_avg_iou"] * 100), logger=logger)
    return m


def run_net(args, config, train_writer=None, val_writer=None, unify: bool = True):
    logger = get_logger(getattr(args, "log_name", "upp_tpu"))
    mesh = make_mesh()
    train_ds = build_dataset_from_cfg(config.dataset.train._base_,
                                      config.dataset.train.others)
    val_ds = build_dataset_from_cfg(config.dataset.val._base_,
                                    config.dataset.val.others)
    bs = int(config.dataset.train.others.bs)
    train_loader = BatchLoader(train_ds, bs, shuffle=True, drop_last=True,
                               seed=args.seed, num_shards=jax.process_count(),
                               shard_index=jax.process_index())
    # val is process-sharded like runner_cls.build_loaders — validate()
    # gathers per-sample rows and dedups shard padding by index, so each
    # host evaluates 1/process_count of the set instead of all of it
    val_loader = BatchLoader(val_ds, int(config.dataset.val.others.bs),
                             shuffle=False, drop_last=False,
                             num_shards=jax.process_count(),
                             shard_index=jax.process_index())

    model = build_model_from_cfg(config.model)
    n_pts = int(config.dataset.train._base_.N_POINTS)
    noisy = bool(config.get("noisy_train", False))
    p_in = (n_pts - int(n_pts * 0.25)) + GAUSSIAN_NUM + LIDAR_NUM if (unify and noisy) else n_pts
    example_pts = jnp.zeros((2, p_in, 3), jnp.float32)
    example_hot = jnp.zeros((2, NUM_CLASSES), jnp.float32)
    example_query = jnp.zeros((2, n_pts, 3), jnp.float32)
    rngs = {"params": jax.random.key(args.seed), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2)}
    from ..models.build import jit_init
    if unify:
        # init through the FULL prompted path regardless of noisy_train:
        # torch creates every module in __init__, so the param tree must not
        # depend on which paths the config exercises (noisy_train=False +
        # noisy eval used to leave prompter params uncreated)
        variables = dict(jit_init(
            model, rngs, example_pts, example_hot, example_query,
            completion_prompt=True, denoise=True,
            point_num=n_pts - int(n_pts * 0.25), deterministic=True))
    else:
        variables = dict(jit_init(model, rngs, example_pts, example_hot,
                                  example_query, deterministic=True))
    variables.setdefault("batch_stats", {})
    if getattr(args, "ckpts", None):
        from .ckpt_io import load_weights, report_load
        variables, missing, unexpected = load_weights(
            variables, args.ckpts, logger=logger)
        report_load(missing, unexpected, logger=logger)

    steps_per_epoch = max(len(train_loader), 1)
    peft = SEG_PEFT_LIST if (unify and getattr(args, "peft_model", True)) else None
    tx, sched, mask = build_optimizer(config, variables["params"],
                                      steps_per_epoch, peft_list=peft)
    trainable, total = count_params(variables["params"], mask)
    print_log(f"# TrainableParams: {trainable/1e6:.2f} M / {total/1e6:.2f} M",
              logger=logger)

    state = TrainState(params=replicate(mesh, variables["params"]),
                       batch_stats=replicate(mesh, variables["batch_stats"]),
                       opt_state=replicate(mesh, tx.init(variables["params"])),
                       step=jnp.zeros((), jnp.int32))
    start_epoch, best_ins_iou = 0, 0.0
    if getattr(args, "resume", False):
        state, start_epoch, saved = ckpt.resume_checkpoint(
            state, args.experiment_path, logger=logger)
        best_ins_iou = saved.get("instance_avg_iou", 0.0)

    train_step = make_seg_train_step(model, tx, config, args, unify)
    eval_step = make_seg_eval_step(model, config, unify)
    rng = jax.random.key(args.seed + 777)
    metrics = {"instance_avg_iou": 0.0}

    for epoch in range(start_epoch, int(config.max_epoch) + 1):
        train_loader.set_epoch(epoch)
        meters = AverageMeter(["loss", "acc"])
        t0 = time.time()
        pending = []  # fetch once per epoch, keep the dispatch pipeline full
        for pts, cls, seg in train_loader:
            batch = shard_batch(mesh, (np.asarray(pts), np.asarray(cls),
                                       np.asarray(seg)))
            state, m = train_step(state, batch[0], batch[1], batch[2], rng)
            pending.append(m)
        for m in jax.device_get(pending):
            meters.update([float(m["loss"]), float(m["acc"])])
        print_log("[Training] EPOCH: %d EpochTime = %.3f (s) Losses = %s" %
                  (epoch, time.time() - t0,
                   ["%.4f" % v for v in meters.avg()]), logger=logger)
        if train_writer is not None:
            # epoch-level scalars (the reference logs per batch,
            # runner_unify_seg.py:254-256; we fetch metrics once per epoch)
            train_writer.add_scalar("Loss/Epoch/Loss", meters.avg(0), epoch)
            train_writer.add_scalar("Loss/Epoch/TrainAcc", meters.avg(1), epoch)
            train_writer.add_scalar("Loss/Epoch/LR",
                                    float(sched(epoch * steps_per_epoch)), epoch)

        if epoch % max(int(getattr(args, "val_freq", 1)), 1) == 0:
            metrics = validate(eval_step, state, val_loader, epoch, logger=logger)
            if val_writer is not None:
                for k in ("accuracy", "class_avg_iou", "instance_avg_iou"):
                    if k in metrics:
                        val_writer.add_scalar(f"Metric/{k}", float(metrics[k]),
                                              epoch)
            if metrics["instance_avg_iou"] >= best_ins_iou:
                best_ins_iou = metrics["instance_avg_iou"]
                ckpt.save_checkpoint(
                    state, epoch, "ckpt-best", args.experiment_path,
                    metrics={k: v for k, v in metrics.items()
                             if isinstance(v, float)}, logger=logger)
        ckpt.save_checkpoint(state, epoch, "ckpt-last", args.experiment_path,
                                metrics={k: v for k, v in metrics.items()
                                         if isinstance(v, float)}, logger=logger)
    ckpt.wait_for_pending_saves()
    return metrics


def finetune_run_net(args, config, train_writer=None, val_writer=None):
    """Full fine-tune seg (``tools/runner_finetune_seg.py``)."""
    return run_net(args, config, train_writer, val_writer, unify=False)


def test_net(args, config, unify: bool = True):
    logger = get_logger(getattr(args, "log_name", "upp_tpu"))
    test_ds = build_dataset_from_cfg(config.dataset.test._base_,
                                     config.dataset.test.others)
    loader = BatchLoader(test_ds, int(config.dataset.test.others.bs),
                         shuffle=False, drop_last=False,
                         num_shards=jax.process_count(),
                         shard_index=jax.process_index())
    model = build_model_from_cfg(config.model)
    n_pts = int(config.dataset.test._base_.N_POINTS)
    rngs = {"params": jax.random.key(args.seed), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2)}
    example_pts = jnp.zeros((2, n_pts, 3), jnp.float32)
    example_hot = jnp.zeros((2, NUM_CLASSES), jnp.float32)
    from ..models.build import jit_init
    if unify:
        variables = dict(jit_init(model, rngs, example_pts, example_hot,
                                  example_pts, completion_prompt=True,
                                  denoise=True, point_num=n_pts,
                                  deterministic=True))
    else:
        variables = dict(jit_init(model, rngs, example_pts, example_hot,
                                  deterministic=True))
    variables.setdefault("batch_stats", {})
    if getattr(args, "ckpts", None):
        from .ckpt_io import load_weights
        variables, _, _ = load_weights(variables, args.ckpts, logger=logger)
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=None, step=jnp.zeros((), jnp.int32))
    eval_step = make_seg_eval_step(model, config, unify)
    return validate(eval_step, state, loader, 0, logger=logger)
