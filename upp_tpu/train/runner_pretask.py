"""Prompter pretraining runner (``tools/runner_pretask.py``).

Trains the Rectification + Completion prompters with Chamfer/noise losses on
cropped+noised clouds. The whole per-step pipeline — augment → random-ratio
viewpoint crop (masked, static-shape) → shell/lidar noise → model → 3 CD-L1
terms + noise loss → masked update — is one jitted step.

Stage-2 at epoch 20 (``runner_pretask.py:283-296``) drops the rectify params
from the trainable set (fresh optimizer state, same params).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import BatchLoader, build_dataset_from_cfg
from ..ops.chamfer import (chamfer_l1, chamfer_l1_per_sample, chamfer_l2,
                           chamfer_l2_per_sample)
from ..ops.corrupt import (gaussian_shell_noise, lidar_noise,
                           separate_point_cloud)
from ..ops.fps import fps
from ..parallel.mesh import (host_local_variables, make_mesh, replicate,
                             shard_batch)
from ..utils.logger import get_logger, print_log
from . import checkpoint as ckpt
from .metrics import AverageMeter, CDMetric, Metrics, completion_metrics
from .optim import build_optimizer, count_params
from .runner_cls import build_loaders, init_model
from .state import TrainState

# tools/runner_pretask.py:110-123
PRETASK_PEFT_LIST = [
    "rectify_adapter", "downstream_adapter", "pretask_adapter",
    "rectify_adapter1", "downstream_adapter1", "pretask_adapter1",
    "rectify_prompts", "downstream_prompts", "pretask_prompts",
    "coarse_pred", "increase_dim", "mask_token", "dense_pred",
    "rectify_prompter", "shape_pred", "predict_token_generator",
    "mask_prompter", "mask_token_generator",
]
# tools/runner_pretask.py:283-296 (epoch-20 switch: rectify set frozen)
PRETASK_STAGE2_LIST = [
    "downstream_adapter", "pretask_adapter", "downstream_adapter1",
    "pretask_adapter1", "downstream_prompts", "pretask_prompts",
    "coarse_pred", "dense_pred", "mask_token", "shape_pred",
    "predict_token_generator", "increase_dim", "mask_prompter",
    "mask_token_generator",
]
STAGE2_EPOCH = 20
GAUSSIAN_NUM = 20   # runner_pretask.py:198
LIDAR_NUM = 32      # runner_pretask.py:207

CROP_RATIOS = {"easy": 0.25, "median": 0.5, "hard": 0.75}
VIEWPOINTS_8 = [(1, 1, 1), (1, 1, -1), (1, -1, 1), (-1, 1, 1),
                (-1, -1, 1), (-1, 1, -1), (1, -1, -1), (-1, -1, -1)]


def make_pretask_train_step(model, tx, config, args):
    npoints = int(config.npoints)
    n_pts_ds = int(config.dataset.train._base_.N_POINTS)
    from .pipeline import resolve_augmentation
    aug_fn = resolve_augmentation(config.get("data_augmentation", None))
    add_noise = bool(getattr(args, "noise", True))
    noise_types = tuple(getattr(args, "noise_type",
                                ("gaussian_noise", "lidar_noise")))

    def train_step(state: TrainState, gt, rng):
        ks = jax.random.split(jax.random.fold_in(rng, state.step), 8)
        if aug_fn is not None:
            gt = aug_fn(ks[0], gt)

        # random crop ratio in [0.15N, 0.5N] per step (runner_pretask.py:179-183)
        num_crop = jax.random.randint(ks[1], (), int(n_pts_ds * 0.15),
                                      int(n_pts_ds * 0.5) + 1)
        partial, cropping = separate_point_cloud(ks[2], gt, num_crop,
                                                 sample_points=npoints)
        points = partial
        B = points.shape[0]
        if add_noise:
            if "gaussian_noise" in noise_types:
                shell = (jax.random.uniform(ks[3], ()) + 2.0) / 3.0
                g = gaussian_shell_noise(ks[4], (B, GAUSSIAN_NUM, 3),
                                         loc=0.0, scale=0.2, shell_radius=shell)
                points = jnp.concatenate([points, g], axis=1)
            if "lidar_noise" in noise_types:
                l = lidar_noise(ks[5], points, LIDAR_NUM, low=1.2, scale=1.5)
                points = jnp.concatenate([points, l], axis=1)

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                points, point_num=npoints, train_with_gaussian=add_noise,
                deterministic=False,
                rngs={"dropout": ks[6], "droppath": ks[7]},
                mutable=["batch_stats"])
            if add_noise:
                predict_center, rebuild, noise_loss, recall = out
            else:
                predict_center, rebuild = out
                noise_loss, recall = jnp.float32(0.0), jnp.float32(1.0)
            # loss terms (runner_pretask.py:217-225)
            cropping_coarse = chamfer_l1(predict_center, cropping)
            cropping_dense = chamfer_l1(rebuild, cropping)
            dense = chamfer_l1(jnp.concatenate([partial, rebuild], axis=1), gt)
            loss = cropping_coarse + cropping_dense + dense + noise_loss
            aux = {"cropping_coarse": cropping_coarse * 1000,
                   "cropping_dense": cropping_dense * 1000,
                   "dense": dense * 1000, "noise_loss": noise_loss * 1000,
                   "recall": recall * 100,
                   "batch_stats": mut["batch_stats"]}
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_stats = aux.pop("batch_stats")
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=params, batch_stats=new_stats,
                                  opt_state=opt_state, step=state.step + 1)
        return new_state, aux

    return jax.jit(train_step, donate_argnums=(0,))


def make_pretask_eval_step(model, config, mode: str = "easy"):
    """Eval: fixed-viewpoint crop → model → coarse/dense CD vs full gt
    (``runner_pretask.py:359-385``)."""
    npoints = int(config.npoints)
    n_pts_ds = int(config.dataset.val._base_.N_POINTS)
    num_crop = int(n_pts_ds * CROP_RATIOS[mode])

    def eval_step(variables, gt, viewpoint):
        partial, _ = separate_point_cloud(jax.random.key(0), gt, num_crop,
                                          sample_points=npoints,
                                          fixed_viewpoint=viewpoint)
        partial_center, _ = fps(partial, 128)
        predict_center, rebuild = model.apply(
            variables, partial, point_num=npoints, train_with_gaussian=False,
            deterministic=True)
        coarse = jnp.concatenate([partial_center, predict_center], axis=1)
        dense = jnp.concatenate([partial, rebuild], axis=1)
        # per-sample [B] vectors so validate() can run batched (val bs = train
        # bs) while its meter averages stay bit-identical to the reference's
        # bs=1 sweep (runner_pretask.py:359-385)
        out = {"sparse_l1": chamfer_l1_per_sample(coarse, gt) * 1000,
               "sparse_l2": chamfer_l2_per_sample(coarse, gt) * 1000,
               "dense_l1": chamfer_l1_per_sample(dense, gt) * 1000,
               "dense_l2": chamfer_l2_per_sample(dense, gt) * 1000}
        # Metrics table entries (runner_pretask.py:385-388): F-Score/CDL1/CDL2
        out.update(completion_metrics(dense, gt))
        return out

    return jax.jit(eval_step)


def validate(eval_step, state, loader, epoch, logger=None, in_detail=False,
             mode: str = "easy") -> CDMetric:
    """CD meters over the val loader; ``in_detail`` sweeps all 8 viewpoints.
    The per-taxonomy Metrics table lives in ``validate_detailed``."""
    meters = AverageMeter(["sparse_l1", "sparse_l2", "dense_l1", "dense_l2"])
    # host-local eval over this host's loader shard (no-op single-process,
    # gather-aware for fsdp-sharded params; parallel/mesh.py)
    variables = host_local_variables(state.variables)
    viewpoints = VIEWPOINTS_8 if in_detail else VIEWPOINTS_8[:1]
    pending = []   # fetch once after the sweep (per-batch fetch = RT stall)
    for batch in loader:
        gt = jnp.asarray(batch[0])
        for vp in viewpoints:
            pending.append(eval_step(variables, gt, jnp.asarray(vp, jnp.float32)))
    for m in jax.device_get(pending):
        # per-sample [B] vectors: accumulate sums + sample counts so a
        # partial trailing batch weighs by its size and the average equals
        # the bs=1 sweep exactly
        meters.update_vectors([np.asarray(m["sparse_l1"]),
                               np.asarray(m["sparse_l2"]),
                               np.asarray(m["dense_l1"]),
                               np.asarray(m["dense_l2"])])
    if jax.process_count() > 1:
        # combine the per-host CD meters (sums + counts) so every host
        # reports — and ckpt-best tracks — the GLOBAL metric; the reference
        # reports rank-local CD only (runner_pretask.py:314-383 has no
        # gather). Shard padding may duplicate a sample; the bias on an
        # averaged CD is ≤1/len(val) and identical on every host.
        from jax.experimental import multihost_utils
        sums_counts = np.asarray(multihost_utils.process_allgather(
            jnp.asarray([meters._sum, [float(c) for c in meters._count]])))
        g_sum = sums_counts[:, 0].sum(0)
        g_cnt = sums_counts[:, 1].sum(0)
        meters.reset()
        meters.update([s / max(c, 1.0) for s, c in zip(g_sum, g_cnt)])
    print_log("[Epoch %d] validate dense Chamfer Distance L2: %.5f"
              % (epoch, meters.avg(3)), logger=logger)
    return CDMetric(meters.avg(3))


def _dataset_taxonomies(dataset):
    """Per-index taxonomy ids WITHOUT loading payloads: every shipped
    completion dataset (ShapeNet-55, Projected_ShapeNet) keeps them in
    ``file_list`` metadata. Returns None when unavailable (then the sweep
    cannot be process-sharded and falls back to full-set iteration)."""
    fl = getattr(dataset, "file_list", None)
    if fl is None:
        return None
    try:
        return [str(s["taxonomy_id"]) for s in fl]
    except (TypeError, KeyError):
        return None


def validate_detailed(eval_step, state, dataset, epoch, logger=None) -> CDMetric:
    """Per-sample detailed eval over a dataset of (taxonomy, model_id,
    (points, label)) items: 8 viewpoints x Metrics table per taxonomy +
    Overall row, exactly the reference's TEST RESULTS report
    (``tools/runner_pretask.py:385-447``).

    Multi-host (VERDICT r4 item 6): the sample sweep is SHARDED round-robin
    across processes when the dataset exposes per-index taxonomy metadata
    (``file_list``); per-(sample, viewpoint) metric rows are then gathered
    with shard-padding dedup-by-index (the runner_seg.validate pattern), so
    every process prints the identical full-set table instead of each host
    redundantly sweeping the whole test set at bs 1."""
    meters = AverageMeter(["sparse_l1", "sparse_l2", "dense_l1", "dense_l2"])
    variables = host_local_variables(state.variables)
    n_proc, pidx = jax.process_count(), jax.process_index()
    taxonomies = _dataset_taxonomies(dataset) if n_proc > 1 else None
    shard = n_proc > 1 and taxonomies is not None
    indices = list(range(pidx, len(dataset), n_proc)) if shard \
        else list(range(len(dataset)))
    cols = ["sparse_l1", "sparse_l2", "dense_l1", "dense_l2"] + Metrics.names()

    local_rows = np.zeros((len(indices), len(VIEWPOINTS_8), len(cols)),
                          np.float64)
    local_tax: list = []
    for k, i in enumerate(indices):
        taxonomy_id, model_id, payload = dataset[i]
        local_tax.append(str(taxonomy_id))
        gt = jnp.asarray(np.asarray(payload[0], np.float32))[None]
        for v, vp in enumerate(VIEWPOINTS_8):
            m = eval_step(variables, gt, jnp.asarray(vp, jnp.float32))
            # CD entries are per-sample [1] vectors here (bs=1 sweep)
            local_rows[k, v] = [float(np.asarray(m[c]).mean()) for c in cols]

    if shard:
        from jax.experimental import multihost_utils
        # pad every shard to the max shard length so process_allgather sees
        # equal shapes; padding rows carry idx=-1 and are dropped
        kmax = (len(dataset) + n_proc - 1) // n_proc
        idx = np.full((kmax,), -1, np.int64)
        idx[:len(indices)] = indices
        rows = np.zeros((kmax,) + local_rows.shape[1:], np.float64)
        rows[:len(indices)] = local_rows
        g_idx, g_rows = [np.asarray(multihost_utils.process_allgather(
            jnp.asarray(a))) for a in (idx, rows)]
        g_idx = g_idx.reshape(-1)
        g_rows = g_rows.reshape((-1,) + g_rows.shape[2:])
        keep = np.flatnonzero(g_idx >= 0)
        order = keep[np.argsort(g_idx[keep], kind="stable")]
        _, first = np.unique(g_idx[order], return_index=True)
        order = order[first]
        all_idx, all_rows = g_idx[order], g_rows[order]
        all_tax = [taxonomies[i] for i in all_idx]
    else:
        all_rows, all_tax = local_rows, local_tax

    category_metrics: dict = {}
    for tax, sample_rows in zip(all_tax, all_rows):
        for row in sample_rows:
            meters.update([float(x) for x in row[:4]])
            category_metrics.setdefault(
                tax, AverageMeter(Metrics.names())).update(
                    [float(x) for x in row[4:]])
    _print_metrics_table(category_metrics, logger)
    print_log("[Epoch %d] validate dense Chamfer Distance L2: %.5f"
              % (epoch, meters.avg(3)), logger=logger)
    return CDMetric(meters.avg(3))


def _print_metrics_table(category_metrics: dict, logger=None) -> None:
    """============ TEST RESULTS ============ table: one row per taxonomy +
    an Overall row averaging the per-taxonomy averages (reference
    ``runner_pretask.py:418-447``)."""
    overall = AverageMeter(Metrics.names())
    print_log("============================ TEST RESULTS "
              "============================", logger=logger)
    print_log("Taxonomy\t#Sample\t" + "\t".join(Metrics.names()),
              logger=logger)
    for tax, meter in category_metrics.items():
        overall.update(meter.avg())
        row = "\t".join("%.3f" % v for v in meter.avg())
        print_log(f"{tax}\t{meter.count(0)}\t{row}", logger=logger)
    print_log("Overall\t\t" + "\t".join("%.3f" % v for v in overall.avg()),
              logger=logger)


def run_net(args, config, train_writer=None, val_writer=None):
    logger = get_logger(getattr(args, "log_name", "upp_tpu"))
    mesh = make_mesh()
    train_loader, val_loader = build_loaders(args, config)

    npoints = int(config.npoints)
    n_in = npoints + GAUSSIAN_NUM + LIDAR_NUM
    example = jnp.zeros((2, n_in, 3), jnp.float32)

    model = None
    from ..models import build_model_from_cfg
    model = build_model_from_cfg(config.model)
    rngs = {"params": jax.random.key(args.seed), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2)}
    from ..models.build import jit_init
    variables = dict(jit_init(model, rngs, example, point_num=npoints,
                              train_with_gaussian=True, deterministic=False))
    variables.setdefault("batch_stats", {})
    if getattr(args, "ckpts", None):
        from .ckpt_io import load_weights, report_load
        variables, missing, unexpected = load_weights(
            variables, args.ckpts, logger=logger)
        report_load(missing, unexpected, logger=logger)

    steps_per_epoch = max(len(train_loader), 1)
    peft = PRETASK_PEFT_LIST if getattr(args, "peft_model", True) else None
    tx, sched, mask = build_optimizer(config, variables["params"],
                                      steps_per_epoch, peft_list=peft)
    trainable, total = count_params(variables["params"], mask)
    print_log(f"# TrainableParams: {trainable/1e6:.2f} M / {total/1e6:.2f} M",
              logger=logger)

    state = TrainState(params=replicate(mesh, variables["params"]),
                       batch_stats=replicate(mesh, variables["batch_stats"]),
                       opt_state=replicate(mesh, tx.init(variables["params"])),
                       step=jnp.zeros((), jnp.int32))
    start_epoch = 0
    best = CDMetric(1000.0)
    if getattr(args, "resume", False):
        state, start_epoch, saved = ckpt.resume_checkpoint(
            state, args.experiment_path, logger=logger)
        best = CDMetric(saved.get("cd", 1000.0))

    train_step = make_pretask_train_step(model, tx, config, args)
    eval_step = make_pretask_eval_step(model, config,
                                       mode=getattr(args, "mode", None) or "easy")
    rng = jax.random.key(args.seed + 777)
    metrics = CDMetric(1000.0)

    def apply_stage2_switch(state):
        # reference flips requires_grad in-place (runner_pretask stage-2
        # freeze): the AdamW chain's state is mask-independent, so keep
        # the live opt_state — moments of params that stay trainable
        # survive the switch (see runner_cls joint-opt note); Adam/SGD's
        # multi_transform state follows the mask and must be re-inited.
        nonlocal tx, sched, mask, train_step
        print_log("[stage 2] freezing rectify set", logger=logger)
        tx, sched, mask = build_optimizer(config, state.params,
                                          steps_per_epoch,
                                          peft_list=PRETASK_STAGE2_LIST)
        train_step = make_pretask_train_step(model, tx, config, args)
        if config.optimizer.type != "AdamW":
            state = state.replace(opt_state=jax.jit(tx.init)(state.params))
        return state

    # a resumed run already past the switch must not revert to stage 1
    if start_epoch > STAGE2_EPOCH:
        state = apply_stage2_switch(state)

    for epoch in range(start_epoch, int(config.max_epoch) + 1):
        train_loader.set_epoch(epoch)
        meters = AverageMeter(["CroppingCoarseLoss", "CroppingDenseLoss",
                               "DenseLoss", "NoiseLoss", "Recall"])
        t0 = time.time()
        pending = []  # fetch once per epoch, keep the dispatch pipeline full
        for batch in train_loader:
            gt = shard_batch(mesh, np.asarray(batch[0]))
            state, m = train_step(state, gt, rng)
            pending.append(m)
        for m in jax.device_get(pending):
            meters.update([float(m["cropping_coarse"]), float(m["cropping_dense"]),
                           float(m["dense"]), float(m["noise_loss"]),
                           float(m["recall"])])
        print_log("[Training] EPOCH: %d EpochTime = %.3f (s) Losses = %s" %
                  (epoch, time.time() - t0,
                   ["%.4f" % v for v in meters.avg()]), logger=logger)
        if train_writer is not None:
            # epoch-level scalars (reference runner_pretask.py:256-261,279
            # logs per batch; we fetch metrics once per epoch)
            for name, v in zip(meters.items, meters.avg()):
                train_writer.add_scalar(f"Loss/Epoch/{name}", v, epoch)
            train_writer.add_scalar("Loss/Epoch/LR",
                                    float(sched(epoch * steps_per_epoch)), epoch)

        if epoch == STAGE2_EPOCH:
            state = apply_stage2_switch(state)

        if epoch % max(int(getattr(args, "val_freq", 1)), 1) == 0:
            metrics = validate(eval_step, state, val_loader, epoch, logger=logger)
            if val_writer is not None:
                # reference runner_pretask.py:444-448
                for k, v in metrics.state_dict().items():
                    val_writer.add_scalar(f"Metric/{k}", float(v), epoch)
            if metrics.better_than(best):
                best = metrics
                ckpt.save_checkpoint(state, epoch, "ckpt-best",
                                        args.experiment_path,
                                        metrics=metrics.state_dict(), logger=logger)
        ckpt.save_checkpoint(state, epoch, "ckpt-last", args.experiment_path,
                                metrics=metrics.state_dict(), logger=logger)
    ckpt.wait_for_pending_saves()
    return best


def test_net(args, config):
    """Detailed pretask eval: 8 fixed viewpoints, crop mode from --mode."""
    logger = get_logger(getattr(args, "log_name", "upp_tpu"))
    test_ds = build_dataset_from_cfg(config.dataset.test._base_,
                                     config.dataset.test.others)
    from ..models import build_model_from_cfg
    model = build_model_from_cfg(config.model)
    npoints = int(config.npoints)
    example = jnp.zeros((2, npoints + GAUSSIAN_NUM + LIDAR_NUM, 3), jnp.float32)
    rngs = {"params": jax.random.key(args.seed), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2)}
    from ..models.build import jit_init
    variables = dict(jit_init(model, rngs, example, point_num=npoints,
                              train_with_gaussian=True, deterministic=False))
    variables.setdefault("batch_stats", {})
    if getattr(args, "ckpts", None):
        from .ckpt_io import load_weights
        variables, _, _ = load_weights(variables, args.ckpts, logger=logger)
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=None, step=jnp.zeros((), jnp.int32))
    eval_step = make_pretask_eval_step(model, config,
                                       mode=getattr(args, "mode", None) or "easy")
    return validate_detailed(eval_step, state, test_ds, 0, logger=logger)
