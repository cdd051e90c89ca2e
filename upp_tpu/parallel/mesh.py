"""Device mesh + sharding helpers.

Replaces the reference's torch.distributed/NCCL layer
(``utils/dist_utils.py:9-54``, DDP wrap ``tools/runner_module.py:48-57``) with
the JAX SPMD model: one ``jax.sharding.Mesh`` with a ``data`` axis over
ICI-connected chips; batches are sharded over ``data``, parameters are
replicated, and XLA inserts the gradient/metric collectives (the explicit
``reduce_tensor``/``gather_tensor`` calls and SyncBN of the reference fall out
of global-semantics jit for free).

The UPP workload is 22M params with ≤140-token sequences — data parallelism
saturates it; the model dimension never needs sharding (SURVEY.md §2.5). The
mesh is still built with a (data, model) factorisation so tensor-parallel
shardings can be introduced without changing call sites.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, model_parallel: int = 1) -> Mesh:
    """Build a (data, model) mesh over all (or given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def shard_batch(mesh: Mesh, batch):
    """Place host arrays on device, sharded along the leading batch axis.

    Single-device meshes bypass NamedSharding entirely: on the tunneled axon
    backend, sharded layouts force the SPMD partitioner onto a program that
    runs ~28x slower than the unpartitioned one (measured: 5.06 s vs 0.18 s
    per flagship train step).

    Multi-PROCESS meshes assemble the global batch from the per-process
    loader shards (each host loads total_bs // process_count rows,
    ``main.py`` split): ``make_array_from_process_local_data`` concatenates
    them along the sharded axis. A plain ``device_put`` would instead treat
    each host's local rows as the whole logical array — every host would
    silently consume only its addressable slice (1/n_proc of what it
    loaded) and the global batch would shrink by n_proc×."""
    if mesh.size == 1:
        dev = mesh.devices.flat[0]
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, dev), batch)
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    if mesh.size == 1:
        dev = mesh.devices.flat[0]
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, dev), tree)
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def host_local_variables(tree):
    """Host-local copy of a variable tree for per-host (process-local) eval.

    Multi-host validate/probe paths run each host's loader shard through an
    independently-jitted eval step, so the inputs must be process-local:
    params committed to the GLOBAL mesh would make jit demand
    globally-addressable arrays. No-op in single-process runs.

    * replicated leaves (dp training): every host already holds the full
      value — take it from the first addressable shard;
    * data-axis-SHARDED leaves (fsdp training): each host holds only its
      1/n slice, so the full value is assembled with a tiled
      ``process_allgather`` (a collective — every process must call this at
      the same point, which validate/probe call sites do).

    The result is re-placed on the local mesh (or local device 0)."""
    if jax.process_count() == 1:
        return tree
    local = jax.local_devices()
    place_mesh = make_mesh(local) if len(local) > 1 else None

    def local_fn(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            if x.sharding.is_fully_replicated:
                x = np.asarray(x.addressable_data(0))
            else:
                from jax.experimental import multihost_utils
                x = np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return (replicate(place_mesh, x) if place_mesh is not None
                else jax.device_put(x, local[0]))

    return jax.tree_util.tree_map(local_fn, tree)


# ------------------------------------------------------------ fsdp (zero-3)

def fsdp_shardings(mesh: Mesh, tree, min_size: int = 16384):
    """ZeRO-3-style parameter/optimizer-state sharding over the ``data`` axis.

    Shards the largest data-divisible dim of every leaf with ≥ ``min_size``
    elements; GSPMD then all-gathers each parameter just before use and
    reduce-scatters its gradient, so per-chip memory for params + Adam
    moments drops ~data× at the cost of one all-gather per layer per step
    (riding ICI, overlapped with compute by the XLA scheduler). Small leaves
    stay replicated — gather latency would dominate their bytes.

    This matters for FULL-param training (the MAE pretrain runner, cfg key
    ``fsdp: true``): the PEFT runners train ~2% of params, whose moments are
    already tiny. Replaces the reference's DDP-only memory model
    (``tools/runner_pretrain.py:80-84`` wraps in DistributedDataParallel —
    every rank holds full params + full moments).

    Use with ``jax.device_put(tree, fsdp_shardings(mesh, tree))``; works on
    the param tree and on ``tx.init(params)`` alike (non-array / scalar
    leaves resolve to replicated).
    """
    nd = mesh.shape.get("data", 1)
    if nd == 1:
        return jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), tree)

    def spec(leaf):
        shape = tuple(getattr(leaf, "shape", ()))
        if int(np.prod(shape, dtype=np.int64)) < min_size:
            return NamedSharding(mesh, P())
        cands = [(s, i) for i, s in enumerate(shape) if s % nd == 0]
        if not cands:
            return NamedSharding(mesh, P())
        _, dim = max(cands)
        s: list = [None] * len(shape)
        s[dim] = "data"
        return NamedSharding(mesh, P(*s))

    return jax.tree_util.tree_map(spec, tree)


# --------------------------------------------------------------- tensor par.

def _tp_spec(path: str, leaf) -> P:
    """PartitionSpec for one parameter under tensor parallelism over the
    ``model`` mesh axis.

    The Megatron-style factorisation on the scanned block stacks
    (``models/scan_blocks.py``; leaves are [L, in, out] with L = depth):
    column-parallel qkv/fc1 (shard the output feature dim), row-parallel
    proj/fc2 (shard the input feature dim) — XLA/GSPMD then inserts exactly
    one all-reduce per attention and per MLP. Everything else (norms, biases,
    prompts, adapters, heads — all tiny) stays replicated."""
    last = path.rsplit("/", 1)[-1]
    nd = getattr(leaf, "ndim", 0)
    if nd == 3:
        if last in ("attn_qkv_kernel", "mlp_fc1_kernel"):
            return P(None, None, "model")        # column parallel
        if last in ("attn_proj_kernel", "mlp_fc2_kernel"):
            return P(None, "model", None)        # row parallel
    return P()


def tp_shardings(mesh: Mesh, params):
    """NamedSharding pytree for ``params`` sharding the transformer block
    matmuls over the ``model`` axis (replicated when the axis has size 1).

    Use with ``jax.device_put(params, tp_shardings(mesh, params))`` and a
    train step jitted with these as in/out shardings — the collectives
    (all-reduce of row-parallel partial sums, gradient psums over ``data``)
    are inserted by the partitioner; no model-code change."""
    if "model" not in mesh.axis_names or mesh.shape["model"] == 1:
        return jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), params)
    sizes = {"model": mesh.shape["model"]}

    def spec(path_tuple, leaf):
        path = "/".join(str(getattr(k, "key", k)) for k in path_tuple)
        s = _tp_spec(path, leaf)
        # only shard dims the axis divides evenly
        for dim, name in enumerate(s):
            if name == "model" and leaf.shape[dim] % sizes["model"]:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, s)

    return jax.tree_util.tree_map_with_path(spec, params)
