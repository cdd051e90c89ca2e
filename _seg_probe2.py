import os, sys, types
os.makedirs("/tmp/upp_jax_cache", exist_ok=True)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/upp_jax_cache")
from upp_tpu.models import build_model_from_cfg
from upp_tpu.train.runner_seg import GAUSSIAN_NUM, LIDAR_NUM, NUM_CLASSES
from upp_tpu.train.metrics import nll_seg_loss
from upp_tpu.utils.config import cfg_from_yaml_file
from upp_tpu.models.build import jit_init
B = int(sys.argv[1]); mode = sys.argv[2]
config = cfg_from_yaml_file("cfgs/unify_shapenetpart_seg.yaml")
n_pts = int(config.dataset.train._base_.N_POINTS)
p_in = (n_pts - int(n_pts * 0.25)) + GAUSSIAN_NUM + LIDAR_NUM
model = build_model_from_cfg(config.model)
rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1), "droppath": jax.random.key(2)}
variables = dict(jit_init(model, rngs, jnp.zeros((2, p_in, 3), jnp.float32),
                          jnp.zeros((2, NUM_CLASSES), jnp.float32),
                          jnp.zeros((2, n_pts, 3), jnp.float32),
                          completion_prompt=True, denoise=True,
                          point_num=p_in, deterministic=False))
variables.setdefault("batch_stats", {})
rng0 = np.random.default_rng(0)
pts = jnp.asarray(rng0.standard_normal((B, p_in, 3)).astype(np.float32))
hot = jax.nn.one_hot(jnp.asarray(rng0.integers(0, 16, B)), 16)
q = jnp.asarray(rng0.standard_normal((B, n_pts, 3)).astype(np.float32))
seg = jnp.asarray(rng0.integers(0, 50, (B, n_pts)).astype(np.int32))

if mode == "fwd_eval":
    f = jax.jit(lambda v, p, h, qq: jnp.sum(model.apply(
        v, p, h, qq, completion_prompt=True, denoise=True,
        point_num=p_in, deterministic=True)))
    print("OK", float(f(variables, pts, hot, q)))
elif mode == "fwd_train":
    def g(v, p, h, qq):
        out, _ = model.apply(v, p, h, qq, completion_prompt=True, denoise=True,
                             point_num=p_in, deterministic=False,
                             rngs={"dropout": jax.random.key(5), "droppath": jax.random.key(6)},
                             mutable=["batch_stats"])
        return nll_seg_loss(out, seg)
    print("OK", float(jax.jit(g)(variables, pts, hot, q)))
elif mode == "grad":
    def g(params, p, h, qq):
        out, _ = model.apply({"params": params, "batch_stats": variables["batch_stats"]},
                             p, h, qq, completion_prompt=True, denoise=True,
                             point_num=p_in, deterministic=False,
                             rngs={"dropout": jax.random.key(5), "droppath": jax.random.key(6)},
                             mutable=["batch_stats"])
        return nll_seg_loss(out, seg)
    loss, grads = jax.jit(jax.value_and_grad(g))(variables["params"], pts, hot, q)
    print("OK", float(loss))
