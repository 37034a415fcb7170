"""One-time torch→Orbax checkpoint conversion.

The framework converts reference ``.pth``/``.pkl``/``.pt`` checkpoints on
the fly (``core/checkpoint.py``: weight-norm folding, NCHW→NHWC transposes,
tolerant DataParallel unpickling), but that costs a torch import + CPU
conversion on every run. This utility converts once to a native Orbax
directory, which every CLI then loads directly (``--classifier_path`` /
``--ddpm_path`` accept directories).

    python -m diffusion_model_for_audio_defense_tpu.cli.convert_checkpoint \
        ckpt.pth out_dir --kind resnext29_8_64

Kinds: any classifier name from ``models.create_model``'s registry
(resnext29_8_64, vgg19_bn, m5, rcnn_kws, ...), plus ``diffwave`` and
``unet``. Replaces the sys.path-hack loader of the reference
(``audio_models/ConvNets_SpeechCommands/create_model.py:8-16``).
"""

from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("src", help="torch checkpoint (.pth/.pkl/.pt)")
    p.add_argument("dst", help="output Orbax directory")
    p.add_argument("--kind", required=True,
                   help="model kind: classifier registry name, 'diffwave', or 'unet'")
    p.add_argument("--num_res_layers", type=int, default=36,
                   help="DiffWave residual layers (diffwave kind only)")
    return p


def convert(src: str, dst: str, kind: str, num_res_layers: int = 36) -> dict:
    from ..core.checkpoint import (
        load_classifier_checkpoint,
        load_diffwave_checkpoint,
        load_unet_checkpoint,
        save_pytree,
    )

    if kind == "diffwave":
        variables = load_diffwave_checkpoint(src, num_res_layers)
    elif kind == "unet":
        variables = load_unet_checkpoint(src)
    else:
        variables = load_classifier_checkpoint(src, kind)
    save_pytree(dst, variables)
    return variables


def main(argv=None):
    args = build_parser().parse_args(argv)
    variables = convert(args.src, args.dst, args.kind, args.num_res_layers)
    import jax

    n = sum(getattr(l, "size", 0) for l in jax.tree.leaves(variables))
    print(f"converted {args.src} ({args.kind}, {n:,} params) -> {args.dst}")
    return args.dst


if __name__ == "__main__":
    main()
