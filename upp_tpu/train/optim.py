"""Optimizer / schedule / PEFT-mask construction.

Replaces the reference's ``tools/builder.py:37-89``:

* AdamW with a no-decay group for 1-D params, biases and anything with
  "token" in its name (``builder.py:40-55``).
* CosLR == timm ``CosineLRScheduler(t_initial=epochs, lr_min=1e-6,
  warmup_lr_init=1e-6, warmup_t=initial_epochs, t_in_epochs=True)``
  (``builder.py:66-75``) — stepped per epoch, reproduced here as a per-step
  schedule through ``steps_per_epoch``.
* The PEFT freeze (``peft_detect`` substring matching, ``utils/misc.py:22-26``
  + ``tools/runner_module.py:62-73``). The reference builds torch AdamW over
  ALL params (``runner_module.py:59`` — the freeze at :68-73 happens AFTER
  build), then flips ``requires_grad`` in-place at the joint-optimization
  switch (``runner_module.py:228-242``); torch skips grad-less params but
  keeps their lazily-created per-param state, so Adam moments of params that
  stay trainable SURVIVE the switch. That is reproduced here with a
  mask-stable AdamW: moments + per-leaf lazy step counts over the full param
  tree, frozen leaves statically zeroed — swapping the trainable mask reuses
  the same optimizer state.
"""

from __future__ import annotations

from typing import Any, Iterable, List, NamedTuple, Optional, Sequence

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


class MaskedAdamWState(NamedTuple):
    """Full-tree AdamW state with torch-style lazily-started per-leaf steps.

    ``count`` is a per-leaf scalar that only advances while the leaf is
    trainable — exactly torch's lazy per-param ``state['step']``, so a param
    unfrozen at the joint-optimization epoch gets fresh bias correction while
    params that stayed trainable keep mature moments
    (``tools/runner_module.py:228-242``). The structure is independent of the
    trainable mask, so a mask swap reuses the state as-is."""
    step: Any          # global step (drives the lr schedule)
    count: Any         # per-leaf step counts
    mu: Any
    nu: Any


def _zero_frozen(mask) -> optax.GradientTransformation:
    """Statically zero gradients of frozen leaves (requires_grad analogue);
    placed BEFORE grad clipping so frozen grads don't inflate the global
    norm (torch's clip_grad_norm_ only sees requires_grad params)."""
    def init(params):
        del params
        return optax.EmptyState()

    def update(grads, state, params=None):
        del params
        return (jax.tree_util.tree_map(
            lambda m, g: g if m else jnp.zeros_like(g), mask, grads), state)

    return optax.GradientTransformation(init, update)


def masked_adamw(sched, weight_decay: float, decay_mask, train_mask,
                 b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8
                 ) -> optax.GradientTransformation:
    """AdamW over the full param tree with a static trainable mask.

    Matches torch AdamW (decoupled decay, denom = sqrt(nu_hat)+eps) on
    trainable leaves and is a no-op on frozen ones: their moments and counts
    stay untouched (not decayed), as torch leaves grad-less params unstepped.
    """
    def init(params):
        z = lambda t: jax.tree_util.tree_map(jnp.zeros_like, t)
        return MaskedAdamWState(
            step=jnp.zeros((), jnp.int32),
            count=jax.tree_util.tree_map(
                lambda _: jnp.zeros((), jnp.int32), params),
            mu=z(params), nu=z(params))

    def update(grads, state, params):
        lr = sched(state.step)

        def leaf(m, dm, g, c, mu, nu, p):
            if not m:                       # static: folded out by XLA
                return c, mu, nu, jnp.zeros_like(p)
            c1 = c + 1
            mu1 = b1 * mu + (1.0 - b1) * g
            nu1 = b2 * nu + (1.0 - b2) * (g * g)
            cf = c1.astype(jnp.float32)
            mu_hat = mu1 / (1.0 - b1 ** cf)
            nu_hat = nu1 / (1.0 - b2 ** cf)
            upd = mu_hat / (jnp.sqrt(nu_hat) + eps)
            if dm:
                upd = upd + weight_decay * p
            return c1, mu1, nu1, -lr * upd

        istup = lambda x: isinstance(x, tuple)
        out = jax.tree_util.tree_map(leaf, train_mask, decay_mask, grads,
                                     state.count, state.mu, state.nu, params)
        pick = lambda i: jax.tree_util.tree_map(
            lambda t: t[i], out, is_leaf=istup)
        new_state = MaskedAdamWState(step=state.step + 1, count=pick(0),
                                     mu=pick(1), nu=pick(2))
        return pick(3), new_state

    return optax.GradientTransformation(init, update)


class _AccumState(NamedTuple):
    inner: Any
    acc: Any
    count: Any


def accumulate_every(tx, k: int):
    """Gradient accumulation with the reference's exact semantics
    (``tools/runner_module.py:199-207``): micro-step gradients are SUMMED
    (never averaged), and every k-th call the wrapped transform — whose chain
    starts with global-norm clip — runs on the accumulated sum; other calls
    emit zero updates. Inner optimizer state (Adam moment/step counts) only
    advances on real steps, like torch's optimizer.step()."""
    if k <= 1:
        return tx

    def init_fn(params):
        return _AccumState(inner=tx.init(params),
                           acc=jax.tree_util.tree_map(jnp.zeros_like, params),
                           count=jnp.zeros((), jnp.int32))

    def update_fn(grads, state, params=None):
        acc = jax.tree_util.tree_map(jnp.add, state.acc, grads)
        count = state.count + 1

        def do_step(operands):
            acc, inner = operands
            updates, inner2 = tx.update(acc, inner, params)
            return (updates,
                    jax.tree_util.tree_map(jnp.zeros_like, acc),
                    inner2, jnp.zeros((), jnp.int32))

        def skip(operands):
            acc, inner = operands
            return (jax.tree_util.tree_map(jnp.zeros_like, acc),
                    acc, inner, count)

        updates, acc2, inner2, count2 = jax.lax.cond(
            count >= k, do_step, skip, (acc, state.inner))
        return updates, _AccumState(inner=inner2, acc=acc2, count=count2)

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(config, params, steps_per_epoch: int,
                    peft_list: Optional[Sequence[str]] = None):
    """(optax transform, schedule fn, trainable-mask pytree).

    The AdamW chain is zero-frozen-grads → grad-clip → masked AdamW, and its
    state structure does NOT depend on the mask: the joint-optimization
    switch rebuilds the transform with the new trainable set while KEEPING
    the live opt_state, so Adam moments of params that stay trainable
    survive — the reference's in-place requires_grad flip
    (``runner_module.py:228-242``)."""
    opti_cfg, sche_cfg = config.optimizer, config.scheduler
    sched = build_schedule(opti_cfg, sche_cfg, steps_per_epoch)
    wd = float(opti_cfg.kwargs.get("weight_decay", 0.0))
    mask = trainable_mask(params, peft_list)
    clip = config.get("grad_norm_clip")

    accum_k = int(config.get("step_per_update", 1) or 1)

    if opti_cfg.type == "AdamW":
        chain = [_zero_frozen(mask)]
        if clip is not None:
            chain.append(optax.clip_by_global_norm(float(clip)))
        chain.append(masked_adamw(sched, wd, weight_decay_mask(params), mask))
        return accumulate_every(optax.chain(*chain), accum_k), sched, mask

    if opti_cfg.type == "Adam":
        inner = optax.adam(learning_rate=sched)
    elif opti_cfg.type == "SGD":
        inner = optax.sgd(learning_rate=sched, nesterov=True,
                          momentum=float(opti_cfg.kwargs.get("momentum", 0.9)))
    else:
        raise NotImplementedError(f"optimizer type {opti_cfg.type}")

    chain = [inner]
    if clip is not None:
        chain = [optax.clip_by_global_norm(float(clip))] + chain
    # Adam/SGD are only used unfrozen in the shipped configs (pretrain /
    # finetune); multi_transform keeps frozen leaves at exact zero if a
    # peft_list is ever passed. NOTE: unlike the AdamW path, a mask swap
    # here needs a state re-init (no shipped config does one).
    labels = jax.tree_util.tree_map(
        lambda m: "trainable" if m else "frozen", mask)
    tx = optax.multi_transform(
        {"trainable": optax.chain(*chain), "frozen": optax.set_to_zero()},
        labels)
    return accumulate_every(tx, accum_k), sched, mask


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
