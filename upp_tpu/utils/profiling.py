"""Tracing / profiling / FLOPs accounting.

The reference has no profiler beyond wall-clock AverageMeters and
commented-out ptflops probes (``tools/runner_module.py:77-79,95-96``,
SURVEY.md §5). TPU-native replacement:

* ``annotate(name)``      — jax.profiler TraceAnnotation context for the
  pipeline phases (crop / rectify / completion / downstream).
* ``maybe_trace(dir)``    — whole-program profiler trace (XPlane, viewable in
  TensorBoard / xprof), enabled via the UPP_PROFILE_DIR env var.
* ``cost_analysis(fn, *args)`` — XLA-reported FLOPs/bytes for a jitted fn,
  the ptflops replacement.
"""

from __future__ import annotations

import contextlib
import os
from typing import Any, Dict, Optional

import jax


def annotate(name: str):
    """Named trace region (shows up in the xprof timeline)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str] = None):
    """Profile the enclosed block when a directory is given (or via the
    UPP_PROFILE_DIR environment variable)."""
    trace_dir = trace_dir or os.environ.get("UPP_PROFILE_DIR")
    if not trace_dir:
        yield
        return
    with jax.profiler.trace(trace_dir):
        yield


def cost_analysis(fn, *args, **kwargs) -> Dict[str, Any]:
    """XLA cost analysis of a jitted function: FLOPs, bytes accessed, and
    derived arithmetic intensity (the ptflops replacement —
    ``runner_module.py:77-79``)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns per-device list
        costs = costs[0]
    flops = float(costs.get("flops", 0.0))
    bytes_accessed = float(costs.get("bytes accessed", 0.0))
    return {
        "flops": flops,
        "bytes_accessed": bytes_accessed,
        "arithmetic_intensity": flops / bytes_accessed if bytes_accessed else 0.0,
        "raw": dict(costs),
    }


def profile_train_step(config_path: str = "cfgs/unify_modelnet_cls.yaml",
                       iters: int = 15, batch_size: int = None,
                       deep: bool = False):
    """Per-phase wall-time profile of the flagship PEFT train step.

    Methodology (see BASELINE.md "round 2 step-time profile"): on tunneled
    TPU backends a synchronous value fetch costs a fixed ~24 ms host round
    trip and ``jax.block_until_ready`` does not reliably block, so every
    phase is measured as a PIPELINED ablation of the full donated train step
    (dispatch ``iters`` steps back-to-back, fetch one scalar at the end) and
    attributed by differencing. Run:

        python -m upp_tpu.utils.profiling [config.yaml]
    """
    import time

    import jax.numpy as jnp
    import numpy as np
    import optax

    from ..models import build_model_from_cfg
    from ..models.build import jit_init
    from ..train.optim import build_optimizer
    from ..train.pipeline import corrupt_batch
    from ..train.runner_cls import PEFT_LIST, cross_entropy_loss_acc
    from ..train.state import TrainState
    from .config import cfg_from_yaml_file

    import copy

    config = cfg_from_yaml_file(config_path)
    B = int(batch_size or config.total_bs)
    n_pts_ds = int(config.dataset.train._base_.N_POINTS)
    npoints = int(config.npoints)

    def build(model_cfg):
        model = build_model_from_cfg(model_cfg)
        rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
                "droppath": jax.random.key(2)}
        variables = dict(jit_init(model, rngs,
                                  jnp.zeros((2, npoints + 72, 3), jnp.float32),
                                  completion_prompt=True, denoise=True,
                                  point_num=npoints, deterministic=True))
        variables.setdefault("batch_stats", {})
        return model, variables

    model, variables = build(config.model)
    tx, _, _ = build_optimizer(config, variables["params"],
                               steps_per_epoch=82, peft_list=PEFT_LIST)
    rng0 = np.random.default_rng(0)
    pts = jnp.asarray(rng0.standard_normal((B, n_pts_ds, 3)).astype(np.float32))
    label = jnp.asarray(rng0.integers(0, 40, B).astype(np.int32))
    key = jax.random.key(1)

    def make_step(do_pipe=True, passes="full", do_grad=True, model=model,
                  tx=tx):
        def train_step(state, pts, label, rng):
            rng = jax.random.fold_in(rng, state.step)
            k_pipe, k_drop, k_path = jax.random.split(rng, 3)
            if do_pipe:
                points = corrupt_batch(
                    k_pipe, pts, npoints=npoints, n_points_dataset=n_pts_ds,
                    noisy_train=True, incomplete_cropping=True, add_noise=True,
                    noise_types=("gaussian_noise", "lidar_noise"),
                    augmentation="scale-translate", normalize=False)
            else:
                points = pts[:, :npoints + 72]
            cp = passes == "full"
            dn = passes == "full"

            def loss_fn(params):
                out, mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    points, completion_prompt=cp, denoise=dn,
                    point_num=npoints, deterministic=False,
                    rngs={"dropout": k_drop, "droppath": k_path},
                    mutable=["batch_stats"])
                loss, acc = cross_entropy_loss_acc(out, label)
                return loss, (acc, mut["batch_stats"])

            if do_grad:
                (loss, (_, new_stats)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
                updates, opt_state = tx.update(grads, state.opt_state,
                                               state.params)
                params = optax.apply_updates(state.params, updates)
            else:
                loss, (_, new_stats) = loss_fn(state.params)
                params, opt_state = state.params, state.opt_state
            return state.replace(params=params, batch_stats=new_stats,
                                 opt_state=opt_state, step=state.step + 1), loss
        return jax.jit(train_step, donate_argnums=(0,))

    def run(variables=variables, tx=tx, **kw):
        step = make_step(tx=tx, **kw)
        cp = lambda t: jax.tree_util.tree_map(jnp.copy, t)
        st = TrainState(params=cp(variables["params"]),
                        batch_stats=cp(variables["batch_stats"]),
                        opt_state=tx.init(cp(variables["params"])),
                        step=jnp.zeros((), jnp.int32))
        st, l = step(st, pts, label, key)
        float(l)
        t0 = time.perf_counter()
        for _ in range(iters):
            st, l = step(st, pts, label, key)
        float(l)
        return (time.perf_counter() - t0) / iters * 1000.0

    def run_variant(**model_cfg_overrides):
        """Full step with a structurally-modified model config — isolates the
        cost of an architectural feature (e.g. per-block prompt propagation)
        that cannot be switched off inside one trace."""
        mc = copy.deepcopy(config.model)
        for k, v in model_cfg_overrides.items():
            parts = k.split(".")
            tgt = mc
            for p in parts[:-1]:
                tgt = tgt[p]
            tgt[parts[-1]] = v
        vmodel, vvars = build(mc)
        vtx, _, _ = build_optimizer(config, vvars["params"],
                                    steps_per_epoch=82, peft_list=PEFT_LIST)
        return run(variables=vvars, tx=vtx, model=vmodel)

    # run() must hand tx to BOTH the step closure and the opt_state init —
    # a variant model's param tree doesn't match the base optimizer's masks.

    full = run()
    no_pipe = run(do_pipe=False)
    down_only = run(passes="downstream")
    fwd_only = run(do_grad=False)
    rows = [
        ("full train step", full),
        ("  crop/noise/augment pipeline", full - no_pipe),
        ("  rectify+completion passes (fwd)", full - down_only),
        ("  bwd + optimizer (PEFT scope)", full - fwd_only),
        ("  downstream fwd + encoder/heads", fwd_only - (full - no_pipe)
         - (full - down_only)),
    ]
    if deep:
        no_prop = run_variant(prompt_propagation_after=False)
        no_adapters = run_variant(**{"prompter_config.rectify_adapter": False,
                                     "prompter_config.pretask_adapter": False,
                                     "prompter_config.downstream_adapter": False})
        no_prompts = run_variant(**{"prompter_config.rectify_prompts": False,
                                    "prompter_config.pretask_prompts": False,
                                    "prompter_config.downstream_prompts": False})
        rows += [
            ("  [deep] prompt propagation (all blocks)", full - no_prop),
            ("  [deep] adapters (all paths)", full - no_adapters),
            ("  [deep] prompt tokens (attn width delta)", full - no_prompts),
        ]
    print(f"{'phase':44s} ms/step  (bs={B}, pipelined x{iters})")
    for name, ms in rows:
        print(f"{name:44s} {ms:7.1f}")
    return dict(rows)


if __name__ == "__main__":
    import sys
    argv = [a for a in sys.argv[1:] if a != "--deep"]
    profile_train_step(*(argv[:1] or ["cfgs/unify_modelnet_cls.yaml"]),
                       deep="--deep" in sys.argv)
