"""UPP-TPU launcher — CLI-compatible with the reference's ``main.py``:

    python main.py --peft_model --config cfgs/unify_modelnet_cls.yaml \
                   --ckpts prompter_bases/mae-modelnet-2.349.pth
    python main.py --test --peft_model --config ... --ckpts <trained>
    python main.py --config cfgs/pretask.yaml        (prompter pretraining)
    python main.py --config cfgs/pretrain.yaml       (MAE pretraining)

Dispatch mirrors ``/root/reference/main.py:75-103``: config.task ×
(--finetune_model | --peft_model | --test)."""

import glob
import os
import sys

# Env-drift guard (see __graft_entry__.py): self-heal a jax-less interpreter
# by grafting the venv site-packages + re-running the axon registration.
try:
    import jax  # noqa: F401
except ImportError:
    _venv = os.environ.get("VIRTUAL_ENV", "/opt/venv")
    for _sp in glob.glob(os.path.join(_venv, "lib", "python3.*", "site-packages")):
        if _sp not in sys.path:
            sys.path.append(_sp)
    sys.modules.pop("sitecustomize", None)
    try:
        import sitecustomize  # noqa: F401
    except Exception:
        pass
    import jax  # noqa: F401


def main():
    from upp_tpu.utils.parser import get_args
    from upp_tpu.utils.config import get_config, log_args_to_file, log_config_to_file
    from upp_tpu.utils.logger import get_root_logger

    args = get_args()
    logger = get_root_logger(
        log_file=os.path.join(args.experiment_path, f"{args.log_name}.log"),
        name=args.log_name)
    config = get_config(args, logger=logger)

    from upp_tpu.utils.jax_cache import enable_compile_cache
    enable_compile_cache()

    # per-split batch sizes from total_bs (main.py:46-60); JAX shards over
    # devices inside the step, so the host batch stays total_bs per process.
    import jax
    per_proc = max(int(config.total_bs) // jax.process_count(), 1)
    for split in ("train", "val", "test", "extra_train"):
        if split in config.dataset:
            # extra_train (the SVM-probe feature loader) runs inference only
            # and doubles the batch (reference main.py:48-49,56-57).
            # pretask val runs BATCHED: the eval step returns per-sample CD
            # vectors, so the meter average is identical to the reference's
            # bs=1 sweep (runner_pretask.py:359-385) at a fraction of the
            # wall-clock; pretask *test* stays bs=1 for the per-sample
            # taxonomy table (validate_detailed).
            config.dataset[split].others.bs = (
                per_proc * 2 if split == "extra_train"
                else per_proc if split == "train"
                else 1 if (config.task == "pretask" and split == "test")
                else per_proc)
            # few-shot split selection: the reference parses --way/--shot/
            # --fold (utils/parser.py:75-80) but never forwards them, so its
            # ModelNetFewShot dataset (which reads config.way) is unreachable
            # from the CLI; here the flags reach the dataset config.
            if config.dataset[split]._base_.get("NAME") == "ModelNetFewShot":
                for k in ("way", "shot", "fold"):
                    v = getattr(args, k, None)
                    if v is not None and v >= 0:
                        config.dataset[split].others[k] = v

    log_args_to_file(args, "args", logger=logger)
    log_config_to_file(config, "config", logger=logger)

    from upp_tpu.train import runner_cls, runner_pretask, runner_pretrain, runner_seg
    from upp_tpu.utils.writer import make_writers

    train_writer, val_writer = (None, None) if args.test else make_writers(args)
    task = config.task
    if args.test:
        if task == "segmentation":
            runner_seg.test_net(args, config, unify=args.peft_model)
        elif task == "pretask":
            runner_pretask.test_net(args, config)
        else:
            runner_cls.test_net(args, config)
    elif task == "classification":
        if args.finetune_model:
            runner_cls.finetune_run_net(args, config, train_writer, val_writer)
        else:
            runner_cls.run_net(args, config, train_writer, val_writer)
    elif task == "segmentation":
        # every task gets both writers (reference main.py:85-103)
        if args.finetune_model:
            runner_seg.finetune_run_net(args, config, train_writer, val_writer)
        else:
            runner_seg.run_net(args, config, train_writer, val_writer)
    elif task == "pretask":
        runner_pretask.run_net(args, config, train_writer, val_writer)
    elif task == "pretrain":
        runner_pretrain.run_net(args, config, train_writer, val_writer)
    else:
        raise NotImplementedError(f"task {task}")


if __name__ == "__main__":
    main()
