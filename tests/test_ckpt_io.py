"""Checkpoint-format dispatch: the framework must eat its OWN checkpoints
through its own CLI (reference ``tools/builder.py:138-163`` + ``test.sh``).

Covers: (a) orbax-dir vs torch-.pth routing on ``--ckpts``; (b) the
pretask→unify handoff — a prompter this framework trained loads into the
unify model with only the expected missing heads (the two-phase
``train.sh:6-21`` workflow); (c) the ``test.sh`` default-argument shape —
CLI-train one epoch, then ``--test --ckpts experiments/<exp>/ckpt-best``
returns the same OA the training run's validate computed."""

import os
import subprocess
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from upp_tpu.utils.config import ConfigDict


def _args(tmp_path, **kw):
    base = dict(seed=0, ckpts=None, resume=False, peft_model=True,
                incomplete_cropping=True, incomplete_shape=True, noise=True,
                noise_type=["gaussian_noise", "lidar_noise"], normalize=False,
                joint_optimization=-1, val_freq=1, vote=False, mode=None,
                deviation=0.1, noise_radius=0.8,
                experiment_path=str(tmp_path), log_name="test")
    base.update(kw)
    return types.SimpleNamespace(**base)


def _transformer(dim=48, depth=4):
    return {"mask_ratio": 0.5, "mask_type": "rand", "trans_dim": dim,
            "encoder_dims": dim, "depth": depth, "drop_path_rate": 0.1,
            "num_heads": 4, "decoder_depth": 2, "decoder_num_heads": 4}


def _prompter(downstream=True):
    p = {"rectify_adapter": True, "rectify_prompts": True,
         "rectify_prompts_num": 2, "rectify_prompts_depth": 2,
         "rectify_depth": 2, "pretask_adapter": True, "pretask_prompts": True,
         "pretask_prompts_num": 2, "pretask_prompts_depth": 3,
         "pretask_depth": 3}
    if downstream:
        p.update({"downstream_adapter": True, "downstream_prompts": True,
                  "downstream_prompts_num": 2, "downstream_prompts_depth": 2,
                  "downstream_depth": 4})
    return p


# ---------------------------------------------------------------------------
# unit: merge semantics
# ---------------------------------------------------------------------------

def test_merge_variables_resolution_and_reporting():
    from upp_tpu.train.ckpt_io import merge_variables

    target = {
        "params": {
            "core": {"encoder": {"first_conv0": {"kernel": np.zeros((3, 8))}},
                     "norm": {"scale": np.ones(8)}},
            "cls_head_finetune": {"lin0": {"kernel": np.zeros((8, 4))}},
        },
        "batch_stats": {"core": {"encoder": {"first_bn": {"mean": np.zeros(8)}}}},
    }
    src_params = {
        # exact-path match
        "core": {"encoder": {"first_conv0": {"kernel": np.full((3, 8), 2.0)}},
                 # shape mismatch → unexpected, not fatal
                 "norm": {"scale": np.ones(16)}},
        # source key with no target slot → unexpected
        "decoder_only_head": {"kernel": np.ones((2, 2))},
    }
    src_stats = {"core": {"encoder": {"first_bn": {"mean": np.full(8, 3.0)}}}}
    out, missing, unexpected = merge_variables(target, src_params, src_stats)
    np.testing.assert_array_equal(
        out["params"]["core"]["encoder"]["first_conv0"]["kernel"], 2.0)
    np.testing.assert_array_equal(
        out["batch_stats"]["core"]["encoder"]["first_bn"]["mean"], 3.0)
    assert any("norm/scale" in u for u in unexpected)
    assert any("decoder_only_head" in u for u in unexpected)
    # untouched target params reported missing, keep their init
    assert "cls_head_finetune/lin0/kernel" in missing
    assert "core/norm/scale" in missing
    np.testing.assert_array_equal(out["params"]["core"]["norm"]["scale"], 1.0)


def test_merge_core_prefix_both_directions():
    """A top-level `encoder` tree loads under `core/`, and a `core/…` tree
    loads into a top-level slot (plain backbone ↔ unify interop)."""
    from upp_tpu.train.ckpt_io import merge_variables

    target = {"params": {"core": {"encoder": {"k": np.zeros(2)}}}}
    out, missing, _ = merge_variables(
        target, {"encoder": {"k": np.ones(2)}})
    np.testing.assert_array_equal(out["params"]["core"]["encoder"]["k"], 1.0)
    assert not missing

    target2 = {"params": {"encoder": {"k": np.zeros(2)}}}
    out2, missing2, _ = merge_variables(
        target2, {"core": {"encoder": {"k": np.ones(2)}}})
    np.testing.assert_array_equal(out2["params"]["encoder"]["k"], 1.0)
    assert not missing2


def test_load_weights_dispatches_torch_vs_orbax(tmp_path):
    """File path → torch shim; directory path → orbax merge."""
    import torch

    from upp_tpu.train.ckpt_io import load_weights

    dim = 4
    target = {"params": {"mask_token": np.zeros((1, 1, dim))},
              "batch_stats": {}}
    pth = str(tmp_path / "w.pth")
    torch.save({"base_model": {"mask_token": torch.full((1, 1, dim), 7.0)}},
               pth)
    out, _, _ = load_weights(dict(target), pth)
    np.testing.assert_array_equal(out["params"]["mask_token"], 7.0)

    # orbax dir written by our own save path
    import orbax.checkpoint as ocp
    od = str(tmp_path / "ckpt-best")
    ocp.PyTreeCheckpointer().save(
        od, {"params": {"mask_token": np.full((1, 1, dim), 9.0)},
             "epoch": 0})
    out2, missing2, unexpected2 = load_weights(dict(target), od)
    np.testing.assert_array_equal(out2["params"]["mask_token"], 9.0)
    assert not missing2 and not unexpected2


# ---------------------------------------------------------------------------
# integration: pretask-trained prompter → unify model (train.sh two-phase)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_pretask_ckpt_loads_into_unify_model(tmp_path):
    """Phase-1 prompter checkpoint (our own orbax dir) loads into the phase-2
    unify model: shared core/prompter leaves carry over bit-exactly, and the
    missing list is exactly the unify-only members (downstream prompts /
    adapters, cls token+head) — like `builder.load_model`'s strict=False
    report on the reference's .pth prompters."""
    from upp_tpu.train import runner_pretask
    from upp_tpu.train.ckpt_io import load_weights
    from upp_tpu.train.torch_ckpt import _flatten

    ds = {"NAME": "Synthetic", "N_POINTS": 512, "NUM_CATEGORY": 4, "SIZE": 16}
    pre_cfg = ConfigDict.from_nested({
        "optimizer": {"type": "AdamW", "kwargs": {"lr": 1e-3, "weight_decay": 0.05}},
        "scheduler": {"type": "CosLR", "kwargs": {"epochs": 5, "initial_epochs": 0}},
        "dataset": {
            "train": {"_base_": ds, "others": {"subset": "train", "bs": 8}},
            "val": {"_base_": ds, "others": {"subset": "test", "bs": 8}},
            "test": {"_base_": ds, "others": {"subset": "test", "bs": 8}},
        },
        "model": {"NAME": "Point_MAE_pretask_dev", "group_size": 8,
                  "num_group": 16, "loss": "cdl2",
                  "transformer_config": _transformer(),
                  "prompter_config": _prompter(downstream=False),
                  "gather_idx": True, "prompt_propagation_after": True},
        "npoints": 128, "total_bs": 8, "step_per_update": 1, "max_epoch": 0,
        "task": "pretask", "data_augmentation": "scale-translate",
    })
    runner_pretask.run_net(_args(tmp_path), pre_cfg)
    ckpt_dir = os.path.join(str(tmp_path), "ckpt-best")
    assert os.path.isdir(ckpt_dir)

    # phase 2: unify classification model over the SAME backbone dims
    from upp_tpu.models import build_model_from_cfg
    from upp_tpu.models.build import jit_init
    uni_model_cfg = ConfigDict.from_nested({
        "NAME": "Point_MAE_unify", "trans_dim": 48, "depth": 4,
        "drop_path_rate": 0.1, "cls_dim": 4, "num_heads": 4,
        "group_size": 8, "num_group": 16, "encoder_dims": 48,
        "transformer_config": _transformer(),
        "adapter_config": {"adapter_dim": 8, "adapter_drop_path_rate": 0.1},
        "prompter_config": _prompter(downstream=True),
        "gather_idx": False, "prompt_propagation_after": True,
    })
    model = build_model_from_cfg(uni_model_cfg)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2), "mask": jax.random.key(3)}
    variables = dict(jit_init(model, rngs, jnp.zeros((2, 200, 3)),
                              completion_prompt=True, denoise=True,
                              point_num=128, deterministic=True))
    variables.setdefault("batch_stats", {})
    before = _flatten(variables["params"])

    merged, missing, unexpected = load_weights(dict(variables), ckpt_dir)
    after = _flatten(merged["params"])

    # every missing key is a unify-only member (phase-2 heads / downstream
    # prompt machinery) — nothing from the shared core goes unfilled
    allowed = ("cls_token", "cls_pos", "cls_head_finetune", "downstream",
               "increase_dim", "mask_prompter", "mask_token_generator")
    bad = [k for k in missing if not any(a in k for a in allowed)]
    assert not bad, f"unexpectedly missing shared keys: {bad[:10]}"
    assert any("cls_head_finetune" in k for k in missing)

    # shared prompter/core leaves actually changed to the trained values
    shared = [k for k in after
              if k not in missing and "rectify_prompter" in k]
    assert shared
    changed = [k for k in shared
               if not np.allclose(np.asarray(after[k]), np.asarray(before[k]))]
    assert changed, "trained prompter weights did not carry over"


# ---------------------------------------------------------------------------
# CLI end-to-end: train → test on our own ckpt-best (test.sh default path)
# ---------------------------------------------------------------------------

_LAUNCHER = (
    "import jax; jax.config.update('jax_platforms', 'cpu');"
    "import runpy, sys; sys.argv = sys.argv[1:];"
    "runpy.run_path(sys.argv[0], run_name='__main__')")


def _run_main(repo, cwd, argv, timeout=900):
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    return subprocess.run(
        [sys.executable, "-c", _LAUNCHER, os.path.join(repo, "main.py")]
        + argv, cwd=cwd, env=env, capture_output=True, text=True,
        timeout=timeout)


@pytest.mark.slow
def test_cli_train_then_test_own_checkpoint(tmp_path):
    """`main.py` trains one epoch and checkpoints; `main.py --test --ckpts
    experiments/<exp>/ckpt-best` (the test.sh:6 default-argument shape) loads
    the orbax dir and reports the same OA the training run's last validate
    computed. Before the format dispatch this exact invocation crashed with
    torch.load-on-a-directory."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ds = {"NAME": "Synthetic", "N_POINTS": 512, "NUM_CATEGORY": 4, "SIZE": 16}
    cfg = {
        "optimizer": {"type": "AdamW", "kwargs": {"lr": 1e-3,
                                                  "weight_decay": 0.05}},
        "scheduler": {"type": "CosLR", "kwargs": {"epochs": 2,
                                                  "initial_epochs": 0}},
        "dataset": {s: {"_base_": dict(ds),
                        "others": {"subset": "train" if s == "train"
                                   else "test"}}
                    for s in ("train", "val", "test")},
        "model": {"NAME": "Point_MAE_unify", "trans_dim": 48, "depth": 4,
                  "drop_path_rate": 0.1, "cls_dim": 4, "num_heads": 4,
                  "group_size": 8, "num_group": 16, "encoder_dims": 48,
                  "transformer_config": _transformer(),
                  "adapter_config": {"adapter_dim": 8,
                                     "adapter_drop_path_rate": 0.1},
                  "prompter_config": _prompter(downstream=True),
                  "gather_idx": False, "prompt_propagation_after": True},
        # ckpt-best is written on the first post-epoch-0 validate
        "npoints": 128, "total_bs": 8, "step_per_update": 1, "max_epoch": 1,
        "grad_norm_clip": 10, "task": "classification",
        "data_augmentation": "scale-translate",
        "noisy_train": True, "noisy_validate": False,
    }
    cfg_path = tmp_path / "tiny_unify_cls.yaml"
    yaml.dump(cfg, open(cfg_path, "w"))

    r = _run_main(repo, tmp_path, ["--peft_model", "--config", str(cfg_path),
                                   "--exp_name", "tiny"])
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    ckpts = list(tmp_path.glob("experiments/**/ckpt-best"))
    assert ckpts, r.stdout[-2000:]
    ckpt_dir = str(ckpts[0])

    # the validate OA recorded into ckpt-best's metrics at save time
    import orbax.checkpoint as ocp
    saved = ocp.PyTreeCheckpointer().restore(ckpt_dir)
    want = float(saved["metrics"]["acc"])

    r2 = _run_main(repo, tmp_path, ["--test", "--peft_model",
                                    "--config", str(cfg_path),
                                    "--exp_name", "tiny_eval",
                                    "--ckpts", ckpt_dir])
    assert r2.returncode == 0, (r2.stdout[-3000:], r2.stderr[-3000:])
    blob = r2.stdout + r2.stderr
    lines = [l for l in blob.splitlines() if "[TEST] acc =" in l]
    assert lines, blob[-2000:]
    got = float(lines[-1].rsplit("=", 1)[1])
    assert got == pytest.approx(want, abs=1e-3), (got, want)
