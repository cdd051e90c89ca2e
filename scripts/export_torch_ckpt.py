"""Export a framework checkpoint as a reference-compatible torch .pth.

    python scripts/export_torch_ckpt.py \
        --ckpt experiments/.../ckpt-best \
        --template path/to/reference_or_prior.pth \
        --out exported.pth [--bare]

``--ckpt`` is one of OUR orbax checkpoint dirs; ``--template`` supplies the
target torch key set/shapes (any reference-format .pth for the same model
family — e.g. the released base you originally warm-started from, or a
prior reference checkpoint). The output loads into the reference's
``load_model_from_ckpt`` / ``load_state_dict(strict=True)``. Keys the
reference never uses in forward (BN num_batches_tracked, the unify
Adapter's unused scale Linear, loss buffers) are zero-filled and listed.
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True, help="orbax checkpoint dir")
    ap.add_argument("--template", required=True,
                    help="reference-format .pth defining target keys/shapes")
    ap.add_argument("--out", required=True, help="output .pth path")
    ap.add_argument("--bare", action="store_true",
                    help="write a bare state dict (default wraps under "
                         "'base_model' like the reference's saves)")
    args = ap.parse_args()

    import orbax.checkpoint as ocp

    from upp_tpu.train.torch_export import save_as_torch

    restored = ocp.PyTreeCheckpointer().restore(args.ckpt)
    variables = {"params": restored["params"]}
    if restored.get("batch_stats"):
        variables["batch_stats"] = restored["batch_stats"]

    report = save_as_torch(variables, args.out, args.template,
                           wrap_key=None if args.bare else "base_model")
    print(f"wrote {args.out}")
    if report["synthesized"]:
        print(f"zero-filled (unused-by-forward) keys: "
              f"{len(report['synthesized'])}")
        for k in report["synthesized"][:20]:
            print(f"  {k}")
    if report["missing"]:
        print("WARNING: template keys with no source leaf (load the result "
              "with strict=False, or check the model config):")
        for k in report["missing"][:40]:
            print(f"  {k}")
        sys.exit(2)


if __name__ == "__main__":
    main()
