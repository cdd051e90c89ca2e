"""Compile-time budget for the four task train steps (VERDICT r3 item 6).

Measures cold (fresh process, compile cache DISABLED) vs warm (persistent
compile cache enabled) first-call latency for one task per process:

    python scripts/compile_budget.py flagship|pretask|seg|pretrain [warm]

Results recorded in BASELINE.md ("Compile-time budget").
"""

import os
import sys
import time

sys.path.insert(0, ".")

MODE = sys.argv[1] if len(sys.argv) > 1 else "flagship"
WARM = len(sys.argv) > 2 and sys.argv[2] == "warm"

if WARM:
    from upp_tpu.utils.jax_cache import enable_compile_cache
    enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from upp_tpu.models import build_model_from_cfg
from upp_tpu.models.build import jit_init
from upp_tpu.train.optim import build_optimizer
from upp_tpu.train.state import TrainState
from upp_tpu.utils.config import cfg_from_yaml_file


def flagship():
    import types
    from upp_tpu.train.runner_cls import make_train_step
    config = cfg_from_yaml_file("cfgs/unify_modelnet_cls.yaml")
    args = types.SimpleNamespace(seed=0, incomplete_cropping=True, noise=True,
                                 noise_type=("gaussian_noise", "lidar_noise"),
                                 normalize=False)
    model = build_model_from_cfg(config.model)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2), "mask": jax.random.key(3)}
    variables = dict(jit_init(model, rngs, jnp.zeros((2, 1096, 3)),
                              completion_prompt=True, denoise=True,
                              point_num=1024, deterministic=False))
    variables.setdefault("batch_stats", {})
    tx, _, _ = build_optimizer(config, variables["params"], steps_per_epoch=82,
                               peft_list=["downstream", "bnorm", "cls"])
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    step = make_train_step(model, tx, config, args)
    B = int(config.total_bs)
    pts = jnp.zeros((B, 8192, 3), jnp.float32)
    label = jnp.zeros((B,), jnp.int32)
    t0 = time.time()
    _, m = step(state, pts, label, jax.random.key(1))
    _ = float(m["loss"])
    print(f"{MODE} {'warm' if WARM else 'cold'} first call: "
          f"{time.time() - t0:.1f} s")


def pretrain():
    from upp_tpu.train.runner_pretrain import make_pretrain_step
    config = cfg_from_yaml_file("cfgs/pretrain.yaml")
    model = build_model_from_cfg(config.model)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2), "mask": jax.random.key(3)}
    variables = dict(jit_init(model, rngs, jnp.zeros((2, 1024, 3)),
                              deterministic=False))
    variables.setdefault("batch_stats", {})
    tx, _, _ = build_optimizer(config, variables["params"], steps_per_epoch=82,
                               peft_list=None)
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    step = make_pretrain_step(model, tx, config)
    pts = jnp.zeros((int(config.total_bs), 8192, 3), jnp.float32)
    t0 = time.time()
    _, m = step(state, pts, jax.random.key(1))
    _ = float(m["loss"])
    print(f"{MODE} {'warm' if WARM else 'cold'} first call: "
          f"{time.time() - t0:.1f} s")


def pretask():
    import types
    from upp_tpu.train.runner_pretask import (GAUSSIAN_NUM, LIDAR_NUM,
                                              PRETASK_PEFT_LIST,
                                              make_pretask_train_step)
    config = cfg_from_yaml_file("cfgs/pretask.yaml")
    args = types.SimpleNamespace(seed=0, noise=True,
                                 noise_type=("gaussian_noise", "lidar_noise"))
    model = build_model_from_cfg(config.model)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2)}
    npoints = int(config.npoints)
    variables = dict(jit_init(model, rngs,
                              jnp.zeros((2, npoints + GAUSSIAN_NUM + LIDAR_NUM, 3)),
                              point_num=npoints, train_with_gaussian=True,
                              deterministic=False))
    variables.setdefault("batch_stats", {})
    tx, _, _ = build_optimizer(config, variables["params"], steps_per_epoch=82,
                               peft_list=PRETASK_PEFT_LIST)
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    step = make_pretask_train_step(model, tx, config, args)
    gt = jnp.zeros((int(config.total_bs),
                    int(config.dataset.train._base_.N_POINTS), 3), jnp.float32)
    t0 = time.time()
    _, m = step(state, gt, jax.random.key(1))
    _ = float(m["dense"])
    print(f"{MODE} {'warm' if WARM else 'cold'} first call: "
          f"{time.time() - t0:.1f} s")


def seg():
    import types
    from upp_tpu.train.runner_seg import (NUM_CLASSES, SEG_PEFT_LIST,
                                          GAUSSIAN_NUM, LIDAR_NUM,
                                          make_seg_train_step)
    config = cfg_from_yaml_file("cfgs/unify_shapenetpart_seg.yaml")
    args = types.SimpleNamespace(seed=0, deviation=0.1, noise_radius=0.8)
    model = build_model_from_cfg(config.model)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2)}
    n_pts = int(config.dataset.train._base_.N_POINTS)
    p_in = (n_pts - int(n_pts * 0.25)) + GAUSSIAN_NUM + LIDAR_NUM
    variables = dict(jit_init(model, rngs, jnp.zeros((2, p_in, 3)),
                              jnp.zeros((2, NUM_CLASSES)),
                              jnp.zeros((2, n_pts, 3)),
                              completion_prompt=True, denoise=True,
                              point_num=n_pts - int(n_pts * 0.25),
                              deterministic=True))
    variables.setdefault("batch_stats", {})
    tx, _, _ = build_optimizer(config, variables["params"], steps_per_epoch=82,
                               peft_list=SEG_PEFT_LIST)
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    step = make_seg_train_step(model, tx, config, args, unify=True)
    B = int(config.total_bs)
    pts = jnp.zeros((B, n_pts, 3), jnp.float32)
    cls = jnp.zeros((B,), jnp.int32)
    target = jnp.zeros((B, n_pts), jnp.int32)
    t0 = time.time()
    _, m = step(state, pts, cls, target, jax.random.key(1))
    _ = float(m["loss"])
    print(f"{MODE} {'warm' if WARM else 'cold'} first call: "
          f"{time.time() - t0:.1f} s")


if __name__ == "__main__":
    {"flagship": flagship, "pretrain": pretrain,
     "pretask": pretask, "seg": seg}[MODE]()
