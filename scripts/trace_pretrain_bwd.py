"""Capture an xprof trace of the pretrain fwd+bwd and print the top self-time
HLO ops (the bwd costs ~7x the model fwd — find out where)."""

import glob
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def main():
    from upp_tpu.models import build_model_from_cfg
    from upp_tpu.models.build import jit_init
    from upp_tpu.utils.config import cfg_from_yaml_file

    config = cfg_from_yaml_file("cfgs/pretrain.yaml")
    config.model["if_half"] = True
    model = build_model_from_cfg(config.model)
    npoints = int(config.npoints)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2), "mask": jax.random.key(3)}
    variables = dict(jit_init(model, rngs,
                              jnp.zeros((2, npoints, 3), jnp.float32),
                              deterministic=False))
    variables.setdefault("batch_stats", {})

    def loss_fn(params, batch_stats, p, k):
        out, _ = model.apply(
            {"params": params, "batch_stats": batch_stats}, p,
            deterministic=False, mutable=["batch_stats"],
            rngs={"dropout": jax.random.fold_in(k, 0),
                  "droppath": jax.random.fold_in(k, 1),
                  "mask": jax.random.fold_in(k, 2)})
        return out

    grad = jax.jit(jax.grad(loss_fn))
    B = int(config.total_bs)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((B, npoints, 3)).astype(np.float32))
    key = jax.random.key(1)

    g = grad(variables["params"], variables["batch_stats"], pts, key)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(g)[0]))

    tdir = "/tmp/upp_trace"
    with jax.profiler.trace(tdir):
        for _ in range(5):
            g = grad(variables["params"], variables["batch_stats"], pts, key)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(g)[0]))

    planes = glob.glob(tdir + "/**/*.xplane.pb", recursive=True)
    print("planes:", planes)
    if not planes:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [planes[-1]], "framework_op_stats", {})
    rows = json.loads(data) if isinstance(data, (str, bytes)) else data
    print(type(rows))
    out = open("/tmp/upp_opstats.json", "w")
    out.write(data if isinstance(data, str) else str(data))
    out.close()
    print("wrote /tmp/upp_opstats.json")


if __name__ == "__main__":
    main()
