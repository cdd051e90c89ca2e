"""PyTorch checkpoint import shim.

Loads the reference's released ``.pth`` checkpoints (mae/recon/femae bases,
prompter_bases/*.pth, trained unify models) into our flax parameter trees,
replicating ``load_model_from_ckpt``'s key remaps exactly
(``models/Point_MAE_unify.py:505-536``): strip ``module.``, drop ``_block``,
strip ``MAE_encoder.`` / ``base_model.`` prefixes — then translate
torch-module naming to our flax layout:

  torch Linear weight [out,in]        → Dense kernel [in,out]   (transpose)
  torch Conv1d/Conv2d k=1 [out,in,1*] → Dense kernel [in,out]
  torch BatchNorm weight/bias         → BatchNorm scale/bias (params)
  torch BatchNorm running_mean/var    → batch_stats mean/var
  Sequential indices                  → our explicit layer names (table below)

Tolerant loading (strict=False analogue): missing / unexpected keys are
returned for reporting, not fatal.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch .pth into {key: np.ndarray}, applying the reference's
    top-level remaps (``Point_MAE_unify.py:505-516``)."""
    import torch
    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # legacy pickle checkpoints need the unsafe loader; warn because this
        # executes pickle bytecode from the file
        import warnings
        warnings.warn(f"{path}: falling back to weights_only=False torch.load "
                      "(legacy pickle format; only load trusted checkpoints)")
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("base_model", ckpt.get("model", ckpt))
    out = {}
    for k, v in state.items():
        k = k.replace("module.", "").replace("_block", "")
        if k.startswith("MAE_encoder."):
            k = k[len("MAE_encoder."):]
        elif k.startswith("base_model."):
            k = k[len("base_model."):]
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


# Sequential-index → our layer-name tables, keyed by torch module stem.
_SEQ_RENAMES = [
    # encoder convs (Encoder first/second_conv Sequentials)
    (re.compile(r"^(?P<p>.*?)encoder\.first_conv\.0\.(?P<t>weight|bias)$"), "{p}encoder/first_conv0"),
    (re.compile(r"^(?P<p>.*?)encoder\.first_conv\.1\.(?P<t>.+)$"), "{p}encoder/first_bn"),
    (re.compile(r"^(?P<p>.*?)encoder\.first_conv\.3\.(?P<t>weight|bias)$"), "{p}encoder/first_conv1"),
    (re.compile(r"^(?P<p>.*?)encoder\.second_conv\.0\.(?P<t>weight|bias)$"), "{p}encoder/second_conv0"),
    (re.compile(r"^(?P<p>.*?)encoder\.second_conv\.1\.(?P<t>.+)$"), "{p}encoder/second_bn"),
    (re.compile(r"^(?P<p>.*?)encoder\.second_conv\.3\.(?P<t>weight|bias)$"), "{p}encoder/second_conv1"),
    # pos embeds / two-layer heads (Linear-GELU-Linear Sequentials)
    (re.compile(r"^(?P<p>.*?)(?P<m>pos_embed|decoder_pos_embed|shape_pred|coarse_pred|predict_token_generator)\.0\.(?P<t>weight|bias)$"), "{p}{m}/lin0"),
    (re.compile(r"^(?P<p>.*?)(?P<m>pos_embed|decoder_pos_embed|shape_pred|coarse_pred|predict_token_generator)\.2\.(?P<t>weight|bias)$"), "{p}{m}/lin1"),
    (re.compile(r"^(?P<p>.*?)MAE_decoder\.norm\.(?P<t>.+)$"), "{p}MAE_decoder/norm"),
    # dense prediction conv heads
    (re.compile(r"^(?P<p>.*?)dense_pred\.0\.(?P<t>weight|bias)$"), "{p}dense_pred_conv"),
    (re.compile(r"^(?P<p>.*?)increase_dim\.0\.(?P<t>weight|bias)$"), "{p}increase_dim_conv"),
    # rectify prompter internals
    (re.compile(r"^(?P<p>.*?)rectify_prompter\.abstraction\.group_divider\..*$"), None),
    (re.compile(r"^(?P<p>.*?)rectify_prompter\.(?P<m>abstraction|propagation1|propagation2)\.mlp_convs\.(?P<i>\d+)\.(?P<t>weight|bias)$"), "{p}rectify_prompter/{m}/conv{i}"),
    (re.compile(r"^(?P<p>.*?)rectify_prompter\.(?P<m>abstraction|propagation1|propagation2)\.mlp_bns\.(?P<i>\d+)\.(?P<t>.+)$"), "{p}rectify_prompter/{m}/bn{i}"),
    (re.compile(r"^(?P<p>.*?)rectify_prompter\.score_head\.0\.(?P<t>weight|bias)$"), "{p}rectify_prompter/score0"),
    (re.compile(r"^(?P<p>.*?)rectify_prompter\.score_head\.3\.(?P<t>weight|bias)$"), "{p}rectify_prompter/score1"),
    # classification head: Sequential [Lin,BN,ReLU,Drop,Lin,BN,ReLU,Drop,Lin]
    (re.compile(r"^cls_head_finetune\.0\.(?P<t>weight|bias)$"), "cls_head_finetune/lin0"),
    (re.compile(r"^cls_head_finetune\.1\.(?P<t>.+)$"), "cls_head_finetune/bn0"),
    (re.compile(r"^cls_head_finetune\.4\.(?P<t>weight|bias)$"), "cls_head_finetune/lin1"),
    (re.compile(r"^cls_head_finetune\.5\.(?P<t>.+)$"), "cls_head_finetune/bn1"),
    (re.compile(r"^cls_head_finetune\.8\.(?P<t>weight|bias)$"), "cls_head_finetune/lin2"),
    # seg heads
    (re.compile(r"^label_conv\.0\.(?P<t>weight|bias)$"), "label_conv/conv0"),
    (re.compile(r"^label_conv\.1\.(?P<t>.+)$"), "label_conv/bn0"),
    (re.compile(r"^label_conv\.3\.(?P<t>weight|bias)$"), "label_conv/conv1"),
    (re.compile(r"^label_conv\.4\.(?P<t>.+)$"), "label_conv/bn1"),
    (re.compile(r"^propagation_0\.mlp_convs\.(?P<i>\d+)\.(?P<t>weight|bias)$"), "propagation_0/conv{i}"),
    (re.compile(r"^propagation_0\.mlp_bns\.(?P<i>\d+)\.(?P<t>.+)$"), "propagation_0/bn{i}"),
    (re.compile(r"^seg_head\.0\.(?P<t>weight|bias)$"), "seg_head/conv0"),
    (re.compile(r"^seg_head\.1\.(?P<t>.+)$"), "seg_head/bn0"),
    (re.compile(r"^seg_head\.4\.(?P<t>weight|bias)$"), "seg_head/conv1"),
    (re.compile(r"^seg_head\.5\.(?P<t>.+)$"), "seg_head/bn1"),
    (re.compile(r"^seg_head\.7\.(?P<t>weight|bias)$"), "seg_head/conv2"),
]

# per-block leaf → (stacked name, collection, transpose) for the scanned stacks
_BLOCK_LEAF_MAP = {
    "norm1.weight": ("norm1_scale", "params", False),
    "norm1.bias": ("norm1_bias", "params", False),
    "norm2.weight": ("norm2_scale", "params", False),
    "norm2.bias": ("norm2_bias", "params", False),
    "attn.qkv.weight": ("attn_qkv_kernel", "params", True),
    "attn.proj.weight": ("attn_proj_kernel", "params", True),
    "attn.proj.bias": ("attn_proj_bias", "params", False),
    "mlp.fc1.weight": ("mlp_fc1_kernel", "params", True),
    "mlp.fc1.bias": ("mlp_fc1_bias", "params", False),
    "mlp.fc2.weight": ("mlp_fc2_kernel", "params", True),
    "mlp.fc2.bias": ("mlp_fc2_bias", "params", False),
    "bnorm.weight": ("bnorm_scale", "params", False),
    "bnorm.bias": ("bnorm_bias", "params", False),
    "bnorm.running_mean": ("bnorm_mean", "batch_stats", False),
    "bnorm.running_var": ("bnorm_var", "batch_stats", False),
}
for _p in ("rectify", "pretask", "downstream"):
    _BLOCK_LEAF_MAP.update({
        f"{_p}_adapter.layer_norm.weight": (f"{_p}_adapter_layer_norm_scale", "params", False),
        f"{_p}_adapter.layer_norm.bias": (f"{_p}_adapter_layer_norm_bias", "params", False),
        f"{_p}_adapter.ln1.weight": (f"{_p}_adapter_ln1_kernel", "params", True),
        f"{_p}_adapter.ln1.bias": (f"{_p}_adapter_ln1_bias", "params", False),
        f"{_p}_adapter.ln2.weight": (f"{_p}_adapter_ln2_kernel", "params", True),
        f"{_p}_adapter.ln2.bias": (f"{_p}_adapter_ln2_bias", "params", False),
        f"{_p}_prompts": (f"{_p}_prompts", "params", False),
    })

_BLOCK_RE = re.compile(r"^(?P<pre>(?:MAE_decoder\.)?)blocks\.(?P<i>\d+)\.(?P<rest>.+)$")


def _translate_stacked(torch_key: str):
    """blocks.blocks.{i}.rest / MAE_decoder.blocks.{i}.rest →
    (flax_prefix, stacked_name, collection, row, transpose) or None."""
    key = torch_key
    if key.startswith("blocks.blocks."):
        prefix, rem = "blocks", key[len("blocks.blocks."):]
    elif key.startswith("MAE_decoder.blocks."):
        prefix, rem = "MAE_decoder/blocks", key[len("MAE_decoder.blocks."):]
    else:
        return None
    i_str, _, rest = rem.partition(".")
    entry = _BLOCK_LEAF_MAP.get(rest)
    if entry is None:
        if rest.endswith("num_batches_tracked") or ".scale." in rest:
            return ("DROP",)
        return ("UNEXPECTED",)
    name, coll, transpose = entry
    return (prefix, name, coll, int(i_str), transpose)


# members that live under `core/` in the unify/pretask/seg flax trees
_CORE_MEMBERS = ("encoder", "pos_embed", "blocks", "norm", "shape_pred",
                 "coarse_pred", "predict_token_generator", "decoder_pos_embed",
                 "MAE_decoder", "dense_pred_conv", "rectify_prompter",
                 "mask_token", "increase_dim_conv")

_BN_PARAM = {"weight": ("params", "scale"), "bias": ("params", "bias")}
_BN_STATS = {"running_mean": ("batch_stats", "mean"),
             "running_var": ("batch_stats", "var")}
_ADAPTER_TAIL = re.compile(r"^(?P<head>.+)\.(?P<leaf>weight|bias|running_mean|running_var|num_batches_tracked)$")


def _translate_key(torch_key: str) -> Optional[Tuple[str, str]]:
    """torch state-dict key → (flax path 'a/b/c', leaf kind) or None to drop.

    leaf kind ∈ {linear_w, linear_b, bn_w, bn_b, bn_mean, bn_var, raw}."""
    if torch_key.endswith("num_batches_tracked"):
        return None
    if ".scale." in torch_key:      # unify Adapter's unused scale Linear
        return None
    if torch_key.startswith("loss"):
        return None

    key = torch_key
    # structural renames first (may loop for nested patterns e.g. blocks.i.adapter.ln1)
    for _ in range(3):
        changed = False
        for pat, repl in _SEQ_RENAMES:
            m = pat.match(key)
            if m:
                if repl is None:
                    return None
                d = m.groupdict()
                new = repl.format(**{k: v for k, v in d.items() if v is not None})
                # '{rest}'-style patterns already embed the tail in `new`;
                # '{t}'-style leaf patterns need it re-appended.
                tail = d.get("t") if "{rest}" not in repl else None
                key = f"{new}.{tail}" if tail else new
                changed = True
                break
        if not changed:
            break

    m = _ADAPTER_TAIL.match(key)
    if m is None:
        # raw parameter (prompts, cls_token, mask_token, cls_pos)
        return key.replace(".", "/"), "raw"
    head, leaf = m.group("head"), m.group("leaf")
    path = head.replace(".", "/")

    is_bn = any(s in path.split("/")[-1] for s in ("bn", "norm1", "norm2"))
    # LayerNorms (norm1/norm2/norm/layer_norm) use scale/bias but are params;
    # distinguish BN by the presence of running stats keys handled below.
    if leaf in ("running_mean", "running_var"):
        return path, {"running_mean": "bn_mean", "running_var": "bn_var"}[leaf]
    if leaf == "weight":
        return path, "linear_w"
    return path, "linear_b"


def _convert_array(arr: np.ndarray, kind: str, is_norm_layer: bool) -> np.ndarray:
    if kind == "linear_w":
        if is_norm_layer:
            return arr                         # LayerNorm/BN scale
        a = np.squeeze(arr)                    # Conv k=1 → [out, in]
        if a.ndim == 2:
            return a.T                          # Dense kernel [in, out]
        return a
    return arr


def load_into_variables(variables, state: Dict[str, np.ndarray],
                        logger=None) -> Tuple[dict, List[str], List[str]]:
    """Merge a translated torch state dict into flax ``variables``.

    Returns (new_variables, missing_keys, unexpected_keys). Params present in
    the tree but absent from the ckpt keep their init (strict=False)."""
    import jax
    from ..utils.logger import print_log

    flat_params = _flatten(variables.get("params", {}))
    flat_stats = _flatten(variables.get("batch_stats", {}))
    hit = set()
    unexpected = []

    new_params = dict(flat_params)
    new_stats = dict(flat_stats)

    for tk, arr in state.items():
        st = _translate_stacked(tk)
        if st is not None:
            if st[0] == "DROP":
                continue
            if st[0] == "UNEXPECTED":
                unexpected.append(tk)
                continue
            prefix, name, coll, row, transpose = st
            target = new_params if coll == "params" else new_stats
            cand = _resolve(f"{prefix}/{name}", target)
            if cand is None:
                unexpected.append(tk)
                continue
            val = np.squeeze(arr)
            if transpose and val.ndim == 2:
                val = val.T
            stack = np.array(target[cand])
            if (tuple(val.shape) != tuple(stack.shape[1:])
                    and val.size == int(np.prod(stack.shape[1:]))):
                # squeeze can over-collapse singleton dims the row layout
                # keeps (e.g. seg's [1, C] per-block prompts with
                # downstream_prompts_num=1 → stacked rows [1, C])
                val = val.reshape(stack.shape[1:])
            if row >= stack.shape[0] or tuple(val.shape) != tuple(stack.shape[1:]):
                unexpected.append(tk)
                continue
            stack[row] = val
            target[cand] = stack
            hit.add(("params" if coll == "params" else "stats", cand))
            continue

        tr = _translate_key(tk)
        if tr is None:
            continue
        path, kind = tr
        if kind in ("bn_mean", "bn_var"):
            leaf = "mean" if kind == "bn_mean" else "var"
            full = f"{path}/{leaf}"
            cand = _resolve(full, new_stats)
            if cand is None:
                unexpected.append(tk)
                continue
            new_stats[cand] = _check_shape(arr, new_stats[cand], tk)
            hit.add(("stats", cand))
            continue

        if kind == "raw":
            cand = _resolve(path, new_params)
            if cand is None:
                unexpected.append(tk)
                continue
            new_params[cand] = _check_shape(
                arr.reshape(new_params[cand].shape) if arr.size == new_params[cand].size
                else arr, new_params[cand], tk)
            hit.add(("params", cand))
            continue

        # linear/norm weight or bias: try Dense naming then norm naming
        leafs = (["kernel", "scale"] if kind == "linear_w" else ["bias"])
        placed = False
        for leaf in leafs:
            full = f"{path}/{leaf}"
            cand = _resolve(full, new_params)
            if cand is not None:
                is_norm = leaf == "scale"
                new_params[cand] = _check_shape(
                    _convert_array(arr, kind, is_norm), new_params[cand], tk)
                hit.add(("params", cand))
                placed = True
                break
        if not placed:
            unexpected.append(tk)

    missing = [k for k in flat_params if ("params", k) not in hit]
    if logger is not None:
        print_log(f"[torch_ckpt] loaded {len(hit)} tensors; "
                  f"{len(missing)} missing, {len(unexpected)} unexpected",
                  logger=logger)

    out = dict(variables)
    out["params"] = _unflatten(new_params)
    if new_stats:
        out["batch_stats"] = _unflatten(new_stats)
    return out, missing, unexpected


def _check_shape(arr: np.ndarray, ref, torch_key: str) -> np.ndarray:
    ref_shape = tuple(ref.shape)
    if tuple(arr.shape) != ref_shape:
        raise ValueError(f"shape mismatch for {torch_key}: ckpt {arr.shape} "
                         f"vs model {ref_shape}")
    return np.asarray(arr, dtype=np.asarray(ref).dtype if hasattr(ref, "dtype") else np.float32)


def _resolve(path: str, flat: Dict[str, np.ndarray]) -> Optional[str]:
    """Find a flax path for a canonical key: as-is, or under core/."""
    if path in flat:
        return path
    head = path.split("/")[0]
    if head in _CORE_MEMBERS:
        cand = f"core/{path}"
        if cand in flat:
            return cand
    return None


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}/{k}"
        if isinstance(v, dict) or hasattr(v, "items"):
            out.update(_flatten(dict(v), key))
        else:
            out[key] = v
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> dict:
    out: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out
