import os, sys, types
os.makedirs("/tmp/upp_jax_cache", exist_ok=True)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/upp_jax_cache")
from upp_tpu.models import build_model_from_cfg
from upp_tpu.train.optim import build_optimizer
from upp_tpu.train.runner_seg import (SEG_PEFT_LIST, make_seg_train_step,
                                      GAUSSIAN_NUM, LIDAR_NUM, NUM_CLASSES)
from upp_tpu.train.state import TrainState
from upp_tpu.utils.config import cfg_from_yaml_file
from upp_tpu.models.build import jit_init
B = int(sys.argv[1])
config = cfg_from_yaml_file("cfgs/unify_shapenetpart_seg.yaml")
args = types.SimpleNamespace(noise=True, deviation=0.1, noise_radius=0.8)
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
tx, _, _ = build_optimizer(config, variables["params"], steps_per_epoch=82, peft_list=SEG_PEFT_LIST)
st = TrainState(params=variables["params"], batch_stats=variables["batch_stats"],
                opt_state=tx.init(variables["params"]), step=jnp.zeros((), jnp.int32))
step = make_seg_train_step(model, tx, config, args, unify=True)
rng0 = np.random.default_rng(0)
pts = jnp.asarray(rng0.standard_normal((B, n_pts, 3)).astype(np.float32))
cls = jnp.asarray(rng0.integers(0, 16, B).astype(np.int32))
seg = jnp.asarray(rng0.integers(0, 50, (B, n_pts)).astype(np.int32))
st, m = step(st, pts, cls, seg, jax.random.key(1))
print("OK loss", float(m["loss"]))
