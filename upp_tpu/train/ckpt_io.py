"""Checkpoint-format dispatch for ``--ckpts`` (reference
``tools/builder.py:138-163`` + ``main.py:75-103``).

The reference framework eats its own checkpoints: ``builder.load_model``
reads the ``.pth`` files its runners save, which is what lets ``train.sh``'s
two-phase workflow (pretask-train a prompter → unify loads it via
``--ckpts``) and ``test.sh``'s eval path work at all. Our runners save
*orbax directories* (``train/checkpoint.py``), so ``--ckpts`` must accept
both formats for the framework to be self-hosting:

* a torch ``.pth`` file → the key-translation shim (``torch_ckpt.py``),
  for the reference's released bases/prompters;
* an orbax checkpoint directory (what ``save_checkpoint`` writes) →
  tolerant subtree merge with the same missing/unexpected reporting, so a
  pretask-phase prompter tree loading into the unify/seg model reports
  exactly like the torch path (strict=False analogue,
  ``Point_MAE_unify.py:517-536``).

All runners route through :func:`load_weights`; the format is detected from
the path (directory → orbax, file → torch).
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from ..utils.logger import print_log
from .torch_ckpt import _CORE_MEMBERS, _flatten, _unflatten


def _resolve(path: str, flat) -> Optional[str]:
    """Match a source path against the target tree: exact, under ``core/``,
    or with ``core/`` stripped — the pretask/unify/seg models nest the shared
    transformer under ``core`` while the plain backbones keep it top-level,
    and a prompter trained in one must load into the other."""
    if path in flat:
        return path
    head, _, rest = path.partition("/")
    if head in _CORE_MEMBERS and f"core/{path}" in flat:
        return f"core/{path}"
    if head == "core" and rest in flat:
        return rest
    return None


def merge_variables(variables, src_params, src_stats=None, logger=None
                    ) -> Tuple[dict, List[str], List[str]]:
    """Tolerant merge of a saved {params, batch_stats} tree into ``variables``.

    Returns (new_variables, missing_keys, unexpected_keys) with the same
    semantics as ``torch_ckpt.load_into_variables``: params present in the
    target but absent from the source keep their init (reported missing);
    source leaves with no shape-compatible target slot are reported
    unexpected, never fatal.
    """
    flat_params = _flatten(variables.get("params", {}))
    flat_stats = _flatten(variables.get("batch_stats", {}))
    hit = set()
    unexpected: List[str] = []

    def place(src_tree, dst_flat, tag):
        for k, v in _flatten(src_tree or {}).items():
            cand = _resolve(k, dst_flat)
            if cand is None:
                unexpected.append(k)
                continue
            ref = dst_flat[cand]
            if tuple(np.shape(v)) != tuple(np.shape(ref)):
                unexpected.append(
                    f"{k} (shape {tuple(np.shape(v))} vs model "
                    f"{tuple(np.shape(ref))})")
                continue
            # read .dtype without materializing ref: np.asarray on a device
            # array fetches the whole tensor (minutes over the axon tunnel)
            dtype = getattr(ref, "dtype", None) or np.float32
            dst_flat[cand] = np.asarray(v, dtype=dtype)
            hit.add((tag, cand))

    place(src_params, flat_params, "params")
    place(src_stats, flat_stats, "stats")

    missing = [k for k in flat_params if ("params", k) not in hit]
    if logger is not None:
        print_log(f"[ckpt_io] merged {len(hit)} tensors; "
                  f"{len(missing)} missing, {len(unexpected)} unexpected",
                  logger=logger)
    out = dict(variables)
    out["params"] = _unflatten(flat_params)
    if flat_stats:
        out["batch_stats"] = _unflatten(flat_stats)
    return out, missing, unexpected


def load_weights(variables, ckpt_path: str, logger=None
                 ) -> Tuple[dict, List[str], List[str]]:
    """Load ``--ckpts`` weights into flax ``variables``, auto-detecting the
    checkpoint format. Returns (variables, missing, unexpected)."""
    if os.path.isdir(ckpt_path):
        from .checkpoint import _checkpointer, wait_for_pending_saves
        wait_for_pending_saves()
        restored = _checkpointer().restore(os.path.abspath(ckpt_path))
        if "params" not in restored:
            raise ValueError(
                f"{ckpt_path}: orbax checkpoint has no 'params' subtree "
                f"(keys: {sorted(restored)})")
        print_log(f"[ckpt_io] loading orbax checkpoint dir {ckpt_path}",
                  logger=logger)
        return merge_variables(variables, restored["params"],
                               restored.get("batch_stats"), logger=logger)
    from .torch_ckpt import load_into_variables, load_torch_state_dict
    return load_into_variables(variables, load_torch_state_dict(ckpt_path),
                               logger=logger)


def report_load(missing, unexpected, logger=None, limit: int = 20) -> None:
    """Shared missing/unexpected key report (strict=False analogue)."""
    if missing:
        print_log(f"missing_keys ({len(missing)}): {missing[:limit]}...",
                  logger=logger)
    if unexpected:
        print_log(f"unexpected_keys ({len(unexpected)}): "
                  f"{unexpected[:limit]}...", logger=logger)
