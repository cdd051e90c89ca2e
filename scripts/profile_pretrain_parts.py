"""Ablation timing of the MAE-pretrain step: where do the 58 ms go?

Times (on the attached TPU): full train step, fwd-only loss, grouping alone,
fwd+bwd without the optimizer, optimizer update alone.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def _sync(out):
    # block_until_ready is NOT a real barrier over the axon tunnel — fetch a
    # leaf to force completion of the whole dispatched chain
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


def timeit(fn, *args, iters=30, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / iters * 1000.0


def main(if_half=True, only=None):
    from upp_tpu.models import build_model_from_cfg
    from upp_tpu.models.build import jit_init
    from upp_tpu.ops.group import group_points
    from upp_tpu.train.optim import build_optimizer
    from upp_tpu.train.runner_pretrain import make_pretrain_step
    from upp_tpu.train.state import TrainState
    from upp_tpu.utils.config import cfg_from_yaml_file

    config = cfg_from_yaml_file("cfgs/pretrain.yaml")
    config.model["if_half"] = if_half
    model = build_model_from_cfg(config.model)
    npoints = int(config.npoints)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2), "mask": jax.random.key(3)}
    variables = dict(jit_init(model, rngs,
                              jnp.zeros((2, npoints, 3), jnp.float32),
                              deterministic=False))
    variables.setdefault("batch_stats", {})
    tx, _, _ = build_optimizer(config, variables["params"], steps_per_epoch=82,
                               peft_list=None)
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    step = make_pretrain_step(model, tx, config)

    B = int(config.total_bs)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((B, npoints, 3)).astype(np.float32))
    key = jax.random.key(1)

    num_group = int(config.model.num_group)
    group_size = int(config.model.group_size)
    if only in (None, "group"):
        gp = jax.jit(lambda p: group_points(p, num_group, group_size))
        print(f"group_points:   {timeit(lambda: gp(pts)):7.2f} ms")
        if only:
            return

    if only == "fpsonly":
        from upp_tpu.ops.fps import fps
        f = jax.jit(lambda p: fps(p, num_group))
        print(f"fps {pts.shape[1]}->{num_group}: {timeit(lambda: f(pts)):7.2f} ms")
        return

    if only == "knnonly":
        from upp_tpu.ops.fps import fps
        from upp_tpu.ops.knn import knn_points
        center, _ = jax.jit(lambda p: fps(p, num_group))(pts)
        center = jax.device_get(center)
        center = jnp.asarray(center)
        f = jax.jit(lambda c, p: knn_points(c, p, group_size))
        print(f"knn_points k={group_size}: {timeit(lambda: f(center, pts)):7.2f} ms")
        return

    det = only is not None and only.endswith("_det")
    if det:
        only = only[:-4]

    def loss_fn(params, batch_stats, p, k):
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, p,
            deterministic=det, mutable=["batch_stats"],
            rngs={"dropout": jax.random.fold_in(k, 0),
                  "droppath": jax.random.fold_in(k, 1),
                  "mask": jax.random.fold_in(k, 2)})
        return out, mut

    if only in (None, "fwd"):
        fwd = jax.jit(loss_fn)
        print(f"fwd only:       {timeit(lambda: fwd(state.params, state.batch_stats, pts, key)):7.2f} ms")
        if only:
            return

    if only in (None, "fwdbwd"):
        grad = jax.jit(jax.grad(lambda p, bs, x, k: loss_fn(p, bs, x, k)[0],
                                has_aux=False))
        print(f"fwd+bwd:        {timeit(lambda: grad(state.params, state.batch_stats, pts, key)):7.2f} ms")
        if only:
            return

    if only in (None, "opt"):
        grad = jax.jit(jax.grad(lambda p, bs, x, k: loss_fn(p, bs, x, k)[0],
                                has_aux=False))
        g = grad(state.params, state.batch_stats, pts, key)
        upd = jax.jit(lambda gg, os, p: tx.update(gg, os, p))
        print(f"optimizer upd:  {timeit(lambda: upd(g, state.opt_state, state.params)):7.2f} ms")
        if only:
            return

    # full (donated) step LAST — donation invalidates the state buffers
    st, m = step(state, pts, key)   # compile + warmup
    t0 = time.time()
    for _ in range(30):
        st, m = step(st, pts, key)
    _ = float(m["loss"])
    print(f"full step:      {(time.time() - t0) / 30 * 1000.0:7.2f} ms")


if __name__ == "__main__":
    # usage: profile_pretrain_parts.py [f32|bf16] [group|fwd|fwdbwd|opt]
    # (single-mode runs isolate each measurement in its own process — in-
    # process sequencing fragments HBM and inflates later measurements)
    half = (sys.argv[1] != "f32") if len(sys.argv) > 1 else True
    main(if_half=half, only=sys.argv[2] if len(sys.argv) > 2 else None)
