"""A/B the MAE-pretrain train step: f32 vs bf16 block-stack matmuls.

VERDICT r3 item 3: the encoder-BN masked-group coupling fix regressed the
pretrain step 53.4 -> 65.6 ms (correctness over speed). The step is
MXU-bound (full-param bwd + AdamW ~ 33 ms of the 53 pre-fix), unlike the
geometry-bound PEFT step where bf16 measured neutral, so `if_half` was
never benchmarked here. This script measures both and a numerics delta.

Run on the attached TPU:  python scripts/bench_pretrain_bf16.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def build(if_half: bool):
    from upp_tpu.models import build_model_from_cfg
    from upp_tpu.models.build import jit_init
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
    return config, state, step


def run(if_half: bool, iters: int = 30):
    config, state, step = build(if_half)
    B = int(config.total_bs)
    n_pts = int(config.dataset.train._base_.N_POINTS)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((B, n_pts, 3)).astype(np.float32))
    key = jax.random.key(1)

    # warmup / compile
    state2, m = step(state, pts, key)
    loss0 = float(m["loss"])
    # pipelined timing: dispatch the chain, fetch once at the end
    t0 = time.time()
    st = state2
    for _ in range(iters):
        st, m = step(st, pts, key)
    _ = float(m["loss"])
    ms = (time.time() - t0) / iters * 1000.0
    print(f"if_half={if_half}: {ms:.1f} ms/step  "
          f"({B / (ms / 1000.0):.0f} clouds/s)  first-step loss={loss0:.6f}",
          flush=True)
    return ms, loss0


if __name__ == "__main__":
    ms32, l32 = run(False)
    ms16, l16 = run(True)
    print(f"speedup: {ms32 / ms16:.2f}x   loss delta: {abs(l32 - l16):.2e} "
          f"(rel {abs(l32 - l16) / max(abs(l32), 1e-9):.2e})")
