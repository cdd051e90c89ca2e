"""Two-phase UPP pipeline rehearsal (VERDICT r3 item 2; reference
``train.sh:6-21`` → ``test.sh:4-24``): pretask-train a prompter, carry its
checkpoint into the unify PEFT phase via ``--ckpts``, and verify the trained
prompter IMPROVES noisy-eval OA over (i) the no-prompter eval path and (ii) a
random-initialised prompter — the paper's central claim, composed end to end
from this framework's own orbax checkpoints.

Tiny-but-real scale on CPU. What is HARD-asserted here: the composition
mechanics (phase-1 orbax ckpt loads into the phase-2 model, both arms train
and checkpoint, all three eval arms produce real OAs) and the prompter's
core geometric function (the pretask-trained rectify prompter reduces
Chamfer distance to the clean cloud and drops the injected outliers, where a
random prompter does neither). The noisy-OA *ordering* between arms is
printed but asserted only at full scale by ``scripts/rehearse_two_phase.py``
on the TPU — see the test docstring for the calibration runs showing why the
CPU-tiny surrogate cannot make that ordering meaningful. Results in
BASELINE.md "Two-phase rehearsal"."""

import os
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from upp_tpu.utils.config import ConfigDict

# eval noise regime: 6 shell outliers out of 512 raw points — the eval FPS to
# 128 keeps ~all of them (FPS prefers isolated far points) ≈ 4.7% of the
# cloud, inside the rectify prompter's 5% drop budget — plus mild jitter
_NOISY = {"NOISE_OUTLIERS": 6, "NOISE_JITTER": 0.01}
_NCLS = 2


def _args(exp_path, **kw):
    base = dict(seed=0, ckpts=None, resume=False, peft_model=True,
                incomplete_cropping=True, incomplete_shape=True, noise=True,
                noise_type=["gaussian_noise", "lidar_noise"], normalize=False,
                joint_optimization=-1, val_freq=4, vote=False, mode=None,
                deviation=0.1, noise_radius=0.8,
                experiment_path=str(exp_path), log_name="two_phase")
    base.update(kw)
    os.makedirs(str(exp_path), exist_ok=True)
    return types.SimpleNamespace(**base)


def _transformer(dim=48, depth=4):
    return {"mask_ratio": 0.5, "mask_type": "rand", "trans_dim": dim,
            "encoder_dims": dim, "depth": depth, "drop_path_rate": 0.1,
            "num_heads": 4, "decoder_depth": 2, "decoder_num_heads": 4}


def _prompter(downstream: bool):
    p = {"rectify_adapter": True, "rectify_prompts": True,
         "rectify_prompts_num": 2, "rectify_prompts_depth": 2,
         "rectify_depth": 2, "pretask_adapter": True, "pretask_prompts": True,
         "pretask_prompts_num": 2, "pretask_prompts_depth": 3,
         "pretask_depth": 3}
    if downstream:
        p.update({"downstream_adapter": True, "downstream_prompts": True,
                  "downstream_prompts_num": 4, "downstream_prompts_depth": 2,
                  "downstream_depth": 4})
    return p


def _ds(noisy: bool, size: int, subset: str):
    base = {"NAME": "Synthetic", "N_POINTS": 512, "NUM_CATEGORY": _NCLS,
            "SIZE": size}
    others = {"subset": subset, "bs": 16}
    if noisy:
        others.update(_NOISY)
    return {"_base_": base, "others": others}


def _unify_model_cfg():
    return {"NAME": "Point_MAE_unify", "trans_dim": 48, "depth": 4,
            "drop_path_rate": 0.1, "cls_dim": _NCLS, "num_heads": 4,
            "group_size": 8, "num_group": 16, "encoder_dims": 48,
            "transformer_config": _transformer(),
            "adapter_config": {"adapter_dim": 8,
                               "adapter_drop_path_rate": 0.1},
            "prompter_config": _prompter(downstream=True),
            "gather_idx": False, "prompt_propagation_after": True}


def _pretask_cfg():
    # 25 epochs × 8 steps: the 12×4 first attempt left the rectify prompter
    # indistinguishable from random (outlier-drop recall 0.1/5.5); at 200
    # steps it reaches ~3.6/5.5 with clean score separation
    return ConfigDict.from_nested({
        "optimizer": {"type": "AdamW", "kwargs": {"lr": 1e-3,
                                                  "weight_decay": 0.05}},
        "scheduler": {"type": "CosLR", "kwargs": {"epochs": 25,
                                                  "initial_epochs": 0}},
        "dataset": {"train": _ds(False, 128, "train"),
                    "val": _ds(False, 16, "test"),
                    "test": _ds(False, 16, "test")},
        "model": {"NAME": "Point_MAE_pretask_dev", "group_size": 8,
                  "num_group": 16, "loss": "cdl2",
                  "transformer_config": _transformer(),
                  "prompter_config": _prompter(downstream=False),
                  "gather_idx": True, "prompt_propagation_after": True},
        "npoints": 128, "total_bs": 16, "step_per_update": 1, "max_epoch": 25,
        "task": "pretask", "data_augmentation": "scale-translate",
    })


def _unify_cfg(noisy_validate: bool):
    # phase-2 PEFT trains THROUGH the prompters (noisy_train=True) so the
    # downstream adapts to the prompted input distribution, with viewpoint
    # crops on (scale-proportional) but injected noise off via args (the
    # production 24+48 noise counts would be 56% of this 128-point cloud)
    return ConfigDict.from_nested({
        "optimizer": {"type": "AdamW", "kwargs": {"lr": 1e-3,
                                                  "weight_decay": 0.05}},
        "scheduler": {"type": "CosLR", "kwargs": {"epochs": 16,
                                                  "initial_epochs": 1}},
        "dataset": {"train": _ds(False, 80, "train"),
                    "val": _ds(True, 48, "test"),
                    "test": _ds(True, 48, "test")},
        "model": _unify_model_cfg(),
        "npoints": 128, "total_bs": 16, "step_per_update": 1, "max_epoch": 16,
        "grad_norm_clip": 10, "task": "classification",
        "data_augmentation": "scale-translate",
        "noisy_train": True, "noisy_validate": noisy_validate,
    })


def _noisy_clean_batch(n=8):
    """Paired noisy/clean clouds: both datasets share the per-index rng
    stream, so noisy[i] is exactly clean[i] + jitter + outlier replacement."""
    from upp_tpu.data.synthetic import SyntheticDataset
    base = dict(N_POINTS=512, NUM_CATEGORY=_NCLS, SIZE=16, subset="test")
    clean_ds = SyntheticDataset(ConfigDict.from_nested(base))
    noisy_ds = SyntheticDataset(ConfigDict.from_nested(dict(base, **_NOISY)))
    clean = np.stack([clean_ds[i][2][0] for i in range(n)])
    noisy = np.stack([noisy_ds[i][2][0] for i in range(n)])
    return jnp.asarray(noisy), jnp.asarray(clean)


def _denoise_stats(variables, noisy, clean):
    """Denoise `fps(noisy)` through a unify model's rectify prompter; return
    (CD-L2 to clean, mean dropped-outlier count). The 6 outliers are the last
    6 raw indices by construction (SyntheticDataset NOISE_OUTLIERS)."""
    from upp_tpu.models import build_model_from_cfg
    from upp_tpu.ops.chamfer import chamfer_l2
    from upp_tpu.ops.fps import fps

    model = build_model_from_cfg(ConfigDict.from_nested(_unify_model_cfg()))
    keep = int(128 * 0.95)

    @jax.jit
    def run(vs, pts_noisy, pts_clean):
        sub, idx = fps(pts_noisy, 128)
        vec = model.apply(
            vs, method=lambda m: m.core.rectify_vectors(sub, True))
        order = jnp.argsort(-jnp.linalg.norm(vec, axis=-1), axis=1)
        cleaned = jnp.take_along_axis(sub + 0.2 * vec,
                                      order[:, -keep:, None], axis=1)
        is_out = idx >= 512 - _NOISY["NOISE_OUTLIERS"]
        drop_hit = jnp.take_along_axis(is_out, order[:, :128 - keep],
                                       axis=1).sum(1)
        return chamfer_l2(cleaned, pts_clean), jnp.mean(drop_hit.astype(
            jnp.float32))

    cd, hits = run(variables, noisy, clean)
    return float(cd), float(hits)


def _init_unify_variables(ckpts=None):
    from upp_tpu.models import build_model_from_cfg
    from upp_tpu.models.build import jit_init
    from upp_tpu.train.ckpt_io import load_weights

    model = build_model_from_cfg(ConfigDict.from_nested(_unify_model_cfg()))
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2), "mask": jax.random.key(3)}
    variables = dict(jit_init(model, rngs, jnp.zeros((2, 200, 3)),
                              completion_prompt=True, denoise=True,
                              point_num=128, deterministic=True))
    variables.setdefault("batch_stats", {})
    if ckpts:
        variables, _, _ = load_weights(variables, ckpts)
    return variables


def test_two_phase_prompter_improves_noisy_oa(tmp_path):
    """Phase 1 → geometric prompter claim (HARD asserts) → phase 2 both arms
    → three-arm noisy OA (mechanics asserted; the OA *ordering* is asserted
    at full scale by scripts/rehearse_two_phase.py on the TPU, not here —
    calibration runs showed the CPU-tiny surrogate cannot make the ordering
    meaningful: with the production noise constants the 48-dim downstream
    collapses to chance in every arm (24+48 injected points are 56% of a
    128-point cloud vs 7% at production shapes), and with noise/crop scaled
    away the prompter-processed training distribution at 16 groups is hard
    enough that arm OAs are dominated by run-to-run variance, not by
    prompter quality."""
    from upp_tpu.train import runner_cls, runner_pretask

    # ---- phase 1: pretask-train the prompter ----------------------------
    # val_freq skips intermediate validates (pure wall-clock at this scale);
    # the handoff uses ckpt-last = the final trained prompter. (ckpt-best is
    # seeded by the pre-training initial validate, reference pattern
    # runner_module.py:84 — at 200 steps the val CD may not yet beat it, a
    # trap the first version of this test fell into.)
    runner_pretask.run_net(_args(tmp_path / "pretask", val_freq=50),
                           _pretask_cfg())
    prompter = str(tmp_path / "pretask" / "ckpt-last")
    assert os.path.isdir(prompter)

    # ---- geometric core claim: the trained rectify prompter denoises ----
    noisy, clean = _noisy_clean_batch()
    cd_trained, hits_trained = _denoise_stats(
        _init_unify_variables(prompter), noisy, clean)
    cd_random, hits_random = _denoise_stats(
        _init_unify_variables(None), noisy, clean)

    from upp_tpu.ops.chamfer import chamfer_l2
    from upp_tpu.ops.fps import fps
    sub, _ = jax.jit(lambda p: fps(p, 128))(noisy)
    cd_raw = float(chamfer_l2(sub, clean))
    print(f"\n[two-phase] denoise CD-L2: trained={cd_trained:.5f} "
          f"random={cd_random:.5f} raw={cd_raw:.5f}; dropped outliers "
          f"trained={hits_trained:.2f} random={hits_random:.2f} (of ~5.5)")
    assert cd_trained < cd_raw, (cd_trained, cd_raw)
    assert cd_trained < cd_random, (cd_trained, cd_random)
    assert hits_trained > max(1.5, 2 * hits_random), (hits_trained, hits_random)

    # ---- phase 2, arm A: PEFT with the trained prompter -----------------
    # (prompters engaged in training so the downstream adapts to them;
    # injected noise off — see docstring)
    runner_cls.run_net(_args(tmp_path / "trained", ckpts=prompter,
                             noise=False),
                       _unify_cfg(noisy_validate=True))
    m_trained = str(tmp_path / "trained" / "ckpt-best")
    assert os.path.isdir(m_trained)

    # ---- phase 2, arm B: identical recipe, random-init prompter ---------
    runner_cls.run_net(_args(tmp_path / "random", noise=False),
                       _unify_cfg(noisy_validate=True))
    m_random = str(tmp_path / "random" / "ckpt-best")

    # ---- three eval arms on the SAME noisy test set ----------------------
    oa_trained = runner_cls.test_net(
        _args(tmp_path / "ev_a", ckpts=m_trained),
        _unify_cfg(noisy_validate=True)).acc
    oa_random = runner_cls.test_net(
        _args(tmp_path / "ev_b", ckpts=m_random),
        _unify_cfg(noisy_validate=True)).acc
    oa_noprompt = runner_cls.test_net(
        _args(tmp_path / "ev_c", ckpts=m_trained),
        _unify_cfg(noisy_validate=False)).acc

    print(f"[two-phase] OA: trained={oa_trained:.2f} random={oa_random:.2f} "
          f"noprompt={oa_noprompt:.2f}")
    # mechanics: every arm evaluated a real checkpoint on the noisy set
    for oa in (oa_trained, oa_random, oa_noprompt):
        assert np.isfinite(oa) and 0.0 <= oa <= 100.0
