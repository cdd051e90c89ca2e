"""Optimizer / schedule / PEFT-mask construction.

Replaces the reference's ``tools/builder.py:37-89``:

* AdamW with a no-decay group for 1-D params, biases and anything with
  "token" in its name (``builder.py:40-55``).
* CosLR == timm ``CosineLRScheduler(t_initial=epochs, lr_min=1e-6,
  warmup_lr_init=1e-6, warmup_t=initial_epochs, t_in_epochs=True)``
  (``builder.py:66-75``) — stepped per epoch, reproduced here as a per-step
  schedule through ``steps_per_epoch``.
* The PEFT freeze (``peft_detect`` substring matching, ``utils/misc.py:22-26``
  + ``tools/runner_module.py:62-73``) becomes an ``optax.masked`` wrapper, so
  frozen params receive no updates and no weight decay. The joint-optimization
  switch at epoch N (``runner_module.py:230-244``) is a new mask + fresh
  optimizer state built from the same params.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import optax


def peft_detect(name: str, targets: Iterable[str]) -> bool:
    """Substring match (``utils/misc.py:22-26``)."""
    return any(t in name for t in targets)


def _param_paths(params) -> List[str]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return ["/".join(_key_str(k) for k in path) for path, _ in flat]


def _key_str(k) -> str:
    return getattr(k, "key", getattr(k, "name", getattr(k, "idx", k))).__str__()


def _mask_like(params, fn):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: fn("/".join(_key_str(k) for k in path), leaf), params)


def trainable_mask(params, peft_list: Optional[Sequence[str]]):
    """Boolean pytree: True where the param is trainable. ``peft_list=None``
    trains everything (full fine-tune / pretrain runners)."""
    if peft_list is None:
        return jax.tree_util.tree_map(lambda _: True, params)
    return _mask_like(params, lambda path, _: peft_detect(path, peft_list))


def weight_decay_mask(params):
    """Decay only weight matrices (``builder.py:47-50``): the reference
    no-decays 1-D params, biases and anything with 'token' in the name. With
    stacked per-block params, norm/BN scales are rank-2 ([L, C]) — excluded by
    name ('scale', 'mean', 'var') to keep the reference's semantics (those
    were 1-D there)."""
    def decay(path, leaf):
        last = path.rsplit("/", 1)[-1]
        if any(s in last for s in ("bias", "scale", "mean", "var")):
            return False
        if "token" in path:
            return False
        return jnp.ndim(leaf) > 1
    return _mask_like(params, decay)


def build_schedule(opti_cfg, sche_cfg, steps_per_epoch: int):
    """Learning-rate schedule as a function of the *step* count, matching the
    reference's per-epoch stepping."""
    base_lr = float(opti_cfg.kwargs.lr)
    kind = sche_cfg.type

    if kind == "CosLR":
        epochs = int(sche_cfg.kwargs.epochs)
        warmup = int(sche_cfg.kwargs.get("initial_epochs", 0))
        lr_min, warmup_init = 1e-6, 1e-6

        def sched(step):
            epoch = step // steps_per_epoch
            warm = warmup_init + (base_lr - warmup_init) * epoch / max(warmup, 1)
            # timm CosineLRScheduler default warmup_prefix=False: the
            # post-warmup cosine is indexed by the RAW epoch over t_initial
            # (builder.py's scheduler kwargs), not by (epoch - warmup)
            t = jnp.clip(epoch / max(epochs, 1), 0.0, 1.0)
            cos = lr_min + 0.5 * (base_lr - lr_min) * (1.0 + jnp.cos(jnp.pi * t))
            return jnp.where(epoch < warmup, warm, cos)

        return sched

    if kind == "LambdaLR":
        decay_step = int(sche_cfg.kwargs.decay_step)
        lr_decay = float(sche_cfg.kwargs.lr_decay)
        lowest = float(sche_cfg.kwargs.lowest_decay)

        def sched(step):
            epoch = step // steps_per_epoch
            return base_lr * jnp.maximum(lr_decay ** (epoch / decay_step), lowest)

        return sched

    if kind == "StepLR":
        size = int(sche_cfg.kwargs.get("step_size", 1))
        gamma = float(sche_cfg.kwargs.get("gamma", 0.1))

        def sched(step):
            epoch = step // steps_per_epoch
            return base_lr * gamma ** (epoch // size)

        return sched

    if kind == "function":
        return lambda step: base_lr

    raise NotImplementedError(f"scheduler type {kind}")


def build_optimizer(config, params, steps_per_epoch: int,
                    peft_list: Optional[Sequence[str]] = None):
    """(optax transform, schedule fn, trainable-mask pytree).

    The chain is grad-clip → AdamW(decay-masked) → trainable-mask, mirroring
    ``clip_grad_norm_(10)`` + grouped AdamW of the reference runner."""
    opti_cfg, sche_cfg = config.optimizer, config.scheduler
    sched = build_schedule(opti_cfg, sche_cfg, steps_per_epoch)
    wd = float(opti_cfg.kwargs.get("weight_decay", 0.0))

    if opti_cfg.type == "AdamW":
        inner = optax.adamw(learning_rate=sched, weight_decay=wd,
                            mask=weight_decay_mask(params))
    elif opti_cfg.type == "Adam":
        inner = optax.adam(learning_rate=sched)
    elif opti_cfg.type == "SGD":
        inner = optax.sgd(learning_rate=sched, nesterov=True,
                          momentum=float(opti_cfg.kwargs.get("momentum", 0.9)))
    else:
        raise NotImplementedError(f"optimizer type {opti_cfg.type}")

    chain = [inner]
    clip = config.get("grad_norm_clip")
    if clip is not None:
        chain = [optax.clip_by_global_norm(float(clip))] + chain

    mask = trainable_mask(params, peft_list)
    # multi_transform (NOT optax.masked: masked passes unmasked updates
    # through as raw gradients) — frozen params get exact zeros, like the
    # reference's requires_grad_(False).
    labels = jax.tree_util.tree_map(
        lambda m: "trainable" if m else "frozen", mask)
    tx = optax.multi_transform(
        {"trainable": optax.chain(*chain), "frozen": optax.set_to_zero()},
        labels)
    return tx, sched, mask


def count_params(params, mask=None):
    """(trainable, total) parameter counts — summary_parameters analogue
    (``utils/misc.py:322-346``)."""
    sizes = jax.tree_util.tree_map(lambda x: int(jnp.size(x)), params)
    total = sum(jax.tree_util.tree_leaves(sizes))
    if mask is None:
        return total, total
    masked = jax.tree_util.tree_map(
        lambda s, m: s if m else 0, sizes, mask)
    return sum(jax.tree_util.tree_leaves(masked)), total
