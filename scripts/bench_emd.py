"""Micro-bench the approx-EMD loss (ops/emd.py) on the attached TPU.

No shipped config exercises EMD in a hot loop (the reference's `--loss emd`
option and the disabled Metrics entry are the only call sites), so this is a
measurement, not an optimization target: VERDICT r3 item 8. Records
fwd and fwd+bwd at the reference's loss shapes.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from upp_tpu.ops.emd import (approx_match, earth_mover_distance,  # noqa: E402
                             match_cost)


def explicit_emd(a, b):
    """The pre-r4 unfused path: materialized [B, n, m] match carry."""
    m = jax.lax.stop_gradient(approx_match(a, b))
    return (match_cost(a, b, m) / a.shape[1]).sum()


def timeit(fn, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn()
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
    return (time.time() - t0) / iters * 1000.0


def main():
    rng = np.random.default_rng(0)
    # hoist all four jits out of the timed lambdas: jax.jit/jax.grad return
    # fresh function objects, so constructing them per-iteration would
    # re-trace every call and invalidate the fused-vs-explicit comparison
    fwd = jax.jit(lambda a, b: earth_mover_distance(a, b).sum())
    bwd = jax.jit(jax.grad(lambda a, b: earth_mover_distance(a, b).sum()))
    e_fwd = jax.jit(explicit_emd)
    e_bwd = jax.jit(jax.grad(explicit_emd, argnums=(0, 1)))
    for B, n, m in [(64, 1024, 1024), (120, 1024, 1024), (64, 2048, 2048)]:
        x = jnp.asarray(rng.standard_normal((B, n, 3)).astype(np.float32))
        y = jnp.asarray(rng.standard_normal((B, m, 3)).astype(np.float32))
        t_f = timeit(lambda: fwd(x, y))
        t_b = timeit(lambda: bwd(x, y))
        e_f = timeit(lambda: e_fwd(x, y))
        e_b = timeit(lambda: e_bwd(x, y))
        print(f"emd [{B},{n}] vs [{B},{m}]: fused fwd {t_f:.2f} ms  "
              f"fwd+bwd {t_b:.2f} ms   |   explicit-match fwd {e_f:.2f} ms  "
              f"fwd+bwd {e_b:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
