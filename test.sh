#!/usr/bin/env bash
# Checkpoint evaluation recipes (reference test.sh). Expected reference OA:
# noisy ModelNet40 92.99, noisy ShapeNet55 90.40, ScanObjectNN OBJ_ONLY 91.39.
set -e

python main.py --test --peft_model --config cfgs/unify_modelnet_cls.yaml \
    --ckpts "${1:-experiments/unify_modelnet_cls/ckpt-best}" "${@:2}"
# python main.py --test --peft_model --config cfgs/unify_shapenet55_cls.yaml --ckpts <ckpt>
# python main.py --test --peft_model --config cfgs/unify_scan_objonly_cls.yaml --ckpts <ckpt>
