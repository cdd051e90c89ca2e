"""Export flax variables as a reference-compatible torch ``.pth``.

The inverse of :mod:`torch_ckpt`'s import shim: a user migrating between
this framework and the reference (``models/Point_MAE_unify.py:505-516``
checkpoint conventions) can hand checkpoints in BOTH directions. The
reference has no analogue (its checkpoints only ever flow torch→torch).

Design: rather than maintaining a hand-inverted copy of the importer's key
tables (which would drift), the exporter is TEMPLATE-DRIVEN — the caller
supplies the target torch module's state-dict keys (and shapes/dtypes),
and each template key is routed through the importer's OWN translators
(`_translate_stacked` / `_translate_key` / `_resolve`) to find the flax
leaf it corresponds to; only the value transforms (transpose / squeeze /
reshape) are inverted here. Whatever the importer can place, the exporter
can produce, by construction.

Template keys the importer deliberately drops (BatchNorm
``num_batches_tracked`` counters, the unify Adapter's unused ``scale``
Linear, the rectify prompter's parameterless ``group_divider``, ``loss*``
buffers) are SYNTHESIZED with zeros so ``load_state_dict(strict=True)``
succeeds, and reported back to the caller.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from .torch_ckpt import (_CORE_MEMBERS, _flatten, _resolve,
                         _translate_key, _translate_stacked)


def _normalize_template_key(k: str) -> str:
    """Apply the same top-level renames ``load_torch_state_dict`` applies to
    a .pth before translation (``torch_ckpt.py:43-48``)."""
    k = k.replace("module.", "").replace("_block", "")
    if k.startswith("MAE_encoder."):
        k = k[len("MAE_encoder."):]
    elif k.startswith("base_model."):
        k = k[len("base_model."):]
    return k


def _template_items(template) -> List[Tuple[str, Tuple[int, ...], Any]]:
    """(key, shape, dtype-or-None) triples from a torch module, a state
    dict of tensors/arrays, a {key: shape} manifest, or a .pth path."""
    if isinstance(template, str):
        import torch
        ckpt = torch.load(template, map_location="cpu", weights_only=True)
        template = ckpt.get("base_model", ckpt.get("model", ckpt))
    if hasattr(template, "state_dict"):
        template = template.state_dict()
    items = []
    for k, v in template.items():
        if hasattr(v, "shape"):
            np_dtype = None
            if hasattr(v, "detach"):       # torch tensor
                v_np = v.detach().cpu().numpy()
                np_dtype = v_np.dtype
                items.append((k, tuple(v_np.shape), np_dtype))
            else:
                items.append((k, tuple(np.asarray(v).shape),
                              np.asarray(v).dtype))
        else:                              # bare shape tuple/list
            items.append((k, tuple(v), None))
    return items


def _invert_linear(val: np.ndarray, shape, is_norm: bool) -> np.ndarray:
    """Invert ``_convert_array``: flax Dense kernel [in, out] → torch
    [out, in] (re-expanded to the template's conv shape, e.g. k=1 Conv1d
    [out, in, 1])."""
    v = np.asarray(val)
    if not is_norm and v.ndim == 2:
        v = v.T
    return v.reshape(shape)


def export_torch_state_dict(variables, template
                            ) -> Tuple[Dict[str, np.ndarray], Dict[str, List[str]]]:
    """Produce a torch-keyed state dict for ``template`` from flax
    ``variables``.

    Args:
      variables: {"params": ..., "batch_stats": ...} flax collections.
      template: the target torch module (or its state_dict, a
        {key: shape} manifest, or a path to a reference-format .pth) —
        defines the exact key set, shapes and dtypes to emit.

    Returns:
      (state, report) where report = {"synthesized": keys filled with
      zeros because the importer has no flax source for them,
      "missing": template keys that map to NO leaf in `variables`
      (left out — load with strict=False or fix the model config)}.
    """
    flat_params = _flatten(variables.get("params", {}))
    flat_stats = _flatten(dict(variables.get("batch_stats", {}) or {}))
    out: Dict[str, np.ndarray] = {}
    synthesized: List[str] = []
    missing: List[str] = []

    def emit(key, arr, shape, dtype):
        a = np.asarray(arr)
        if a.size != int(np.prod(shape)):
            missing.append(key)
            return
        a = a.reshape(shape)
        out[key] = a.astype(dtype) if dtype is not None else a

    for orig_key, shape, dtype in _template_items(template):
        tk = _normalize_template_key(orig_key)

        st = _translate_stacked(tk)
        if st is not None:
            if st[0] in ("DROP", "UNEXPECTED"):
                out[orig_key] = np.zeros(
                    shape, dtype if dtype is not None else np.float32)
                synthesized.append(orig_key)
                continue
            prefix, name, coll, row, transpose = st
            target = flat_params if coll == "params" else flat_stats
            cand = _resolve(f"{prefix}/{name}", target)
            if cand is None or row >= np.asarray(target[cand]).shape[0]:
                missing.append(orig_key)
                continue
            val = np.asarray(target[cand])[row]
            if transpose and val.ndim == 2:
                val = val.T
            emit(orig_key, val, shape, dtype)
            continue

        tr = _translate_key(tk)
        if tr is None:
            # importer drops these (num_batches_tracked, adapter scale
            # Linear, loss buffers, group_divider): synthesize zeros so a
            # strict torch load succeeds — all are unused by the reference
            # forward (torch_ckpt.py:163-168 documents why they're dropped)
            out[orig_key] = np.zeros(
                shape, dtype if dtype is not None else np.float32)
            synthesized.append(orig_key)
            continue

        path, kind = tr
        if kind in ("bn_mean", "bn_var"):
            leaf = "mean" if kind == "bn_mean" else "var"
            cand = _resolve(f"{path}/{leaf}", flat_stats)
            if cand is None:
                missing.append(orig_key)
            else:
                emit(orig_key, flat_stats[cand], shape, dtype)
            continue

        if kind == "raw":
            cand = _resolve(path, flat_params)
            if cand is None:
                missing.append(orig_key)
            else:
                emit(orig_key, flat_params[cand], shape, dtype)
            continue

        # linear/norm weight or bias — same resolution order as the import
        leafs = ["kernel", "scale"] if kind == "linear_w" else ["bias"]
        for leaf in leafs:
            cand = _resolve(f"{path}/{leaf}", flat_params)
            if cand is not None:
                emit(orig_key,
                     _invert_linear(flat_params[cand], shape,
                                    is_norm=(leaf == "scale")),
                     shape, dtype)
                break
        else:
            missing.append(orig_key)

    return out, {"synthesized": synthesized, "missing": missing}


def save_as_torch(variables, path: str, template,
                  wrap_key: Optional[str] = "base_model",
                  logger=None) -> Dict[str, List[str]]:
    """Write ``variables`` as a reference-format torch checkpoint.

    ``wrap_key='base_model'`` matches the reference's saved layout
    (``tools/builder.py`` save_checkpoint); ``None`` writes a bare state
    dict. Returns the export report (see export_torch_state_dict)."""
    import torch

    from ..utils.logger import print_log

    state, report = export_torch_state_dict(variables, template)
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in state.items()}
    torch.save({wrap_key: tensors} if wrap_key else tensors, path)
    if logger is not None:
        print_log(
            f"[torch_export] wrote {len(tensors)} tensors to {path} "
            f"({len(report['synthesized'])} synthesized, "
            f"{len(report['missing'])} missing)", logger=logger)
    return report
