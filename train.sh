#!/usr/bin/env bash
# Reproduction recipes (reference train.sh): pretask prompter pretraining per
# backbone/dataset, then the unify/PEFT phase on the resulting prompter base.
set -e

# ---- phase 1: prompter pretraining (pretask) ------------------------------
# ModelNet40 prompters
# python main.py --config cfgs/pretask_modelnet.yaml --ckpts pretrained_bases/mae_base.pth
# python main.py --config cfgs/pretask_modelnet.yaml --ckpts pretrained_bases/recon_base.pth
# python main.py --config cfgs/pretask_modelnet.yaml --ckpts pretrained_bases/femae_base.pth
# ShapeNet55 prompters
# python main.py --config cfgs/pretask_shapenet.yaml --ckpts pretrained_bases/mae_base.pth
# ScanObjectNN prompters
# python main.py --config cfgs/pretask_scan_objonly.yaml --ckpts pretrained_bases/femae_base.pth

# ---- phase 2: unify / PEFT -------------------------------------------------
python main.py --peft_model --config cfgs/unify_modelnet_cls.yaml \
    --ckpts prompter_bases/mae-modelnet-2.349.pth "$@"
# python main.py --peft_model --config cfgs/unify_shapenet55_cls.yaml \
#     --ckpts prompter_bases/mae-shapenet-1.521.pth
# python main.py --peft_model --config cfgs/unify_scan_objonly_cls.yaml \
#     --ckpts prompter_bases/femae-objonly-2.963.pth
# python main.py --peft_model --config cfgs/unify_shapenetpart_seg.yaml \
#     --ckpts prompter_bases/mae-shapenetpart.pth
