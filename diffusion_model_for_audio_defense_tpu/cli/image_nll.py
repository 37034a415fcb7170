"""Bits/dim NLL evaluation for the spectrogram diffusion model.

Rebuild of ``Improved_Diffusion_Unconditional/scripts/image_nll.py``: walk
the dataset, run the full variational bound per example via
``GaussianDiffusion.calc_bpd_loop`` (a ``lax.scan`` over all T steps inside
one jit — the reference loops t on host per microbatch), and report the
running mean bpd. Per-timestep term curves are saved as ``{vb,mse,
xstart_mse}_terms.npz`` like the reference (:71-76).

The data here is the SC09 mel-spectrogram set (this repo's diffusion is the
spectrogram defense model); the reference's image loader is replaced by the
same wave→mel pipeline used for training.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from .spectrogram_train import load_sc09_spectrogram_data, model_and_diffusion_defaults


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    defaults = dict(
        data_dir="datasets/speech_commands/test", clip_denoised=True,
        num_samples=1000, batch_size=16, model_path="", out_dir="",
    )
    defaults.update(model_and_diffusion_defaults())
    for k, v in defaults.items():
        if isinstance(v, bool):
            p.add_argument(f"--{k}", default=v, type=lambda s: s.lower() in ("1", "true", "yes"))
        else:
            p.add_argument(f"--{k}", default=v, type=type(v))
    p.add_argument("--no_pallas_attention", action="store_true",
                   help="opt out of the fused Pallas attention kernel (TPU-only default on)")
    return p


def run_bpd_evaluation(model_fn, diffusion, data, num_samples, clip_denoised,
                       rng=None, log=print, out_dir=""):
    """Reference ``image_nll.py:51-82``; returns the mean total bpd."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    from ..core.functional import jit_hoisted

    bpd_fn = jit_hoisted(
        lambda x, k: diffusion.calc_bpd_loop(model_fn, x, k, clip_denoised=clip_denoised)
    )
    all_bpd, terms = [], {"vb": [], "mse": [], "xstart_mse": []}
    num_complete = 0
    while num_complete < num_samples:
        batch = jnp.asarray(next(data))
        rng, k = jax.random.split(rng)
        metrics = jax.device_get(bpd_fn(batch, k))
        for key in terms:
            terms[key].append(np.asarray(metrics[key]).mean(axis=0))
        all_bpd.append(float(np.asarray(metrics["total_bpd"]).mean()))
        num_complete += batch.shape[0]
        log(f"done {num_complete} samples: bpd={np.mean(all_bpd):.5g}")
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        for name, curves in terms.items():
            np.savez(os.path.join(out_dir, f"{name}_terms.npz"),
                     np.mean(np.stack(curves), axis=0))
    return float(np.mean(all_bpd))


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ..core.checkpoint import load_pytree, load_unet_checkpoint
    from ..models.unet import create_unet
    from ..purify.diffusion_math import create_gaussian_diffusion

    model = create_unet(
        image_size=args.image_size, num_channels=args.num_channels,
        num_res_blocks=args.num_res_blocks, learn_sigma=args.learn_sigma,
        attention_resolutions=args.attention_resolutions, dropout=args.dropout,
        num_heads=args.num_heads, num_heads_upsample=args.num_heads_upsample,
        use_scale_shift_norm=args.use_scale_shift_norm,
        # fused Pallas attention on TPU only (the kernel uses
        # pltpu.CompilerParams — ADVICE r4); per-block shape guard in
        # AttentionBlock means non-production widths just fall back
        use_pallas_attention=jax.default_backend() == "tpu" and not args.no_pallas_attention,
    )
    diffusion = create_gaussian_diffusion(
        steps=args.diffusion_steps, learn_sigma=args.learn_sigma, sigma_small=args.sigma_small,
        noise_schedule=args.noise_schedule, use_kl=args.use_kl,
        predict_xstart=args.predict_xstart, rescale_timesteps=args.rescale_timesteps,
        rescale_learned_sigmas=args.rescale_learned_sigmas,
        timestep_respacing=args.timestep_respacing,
    )
    if not args.model_path:
        raise SystemExit("--model_path is required (torch .pt/.pth file or an Orbax checkpoint dir)")
    if args.model_path.endswith(".pt") or args.model_path.endswith(".pth"):
        variables = load_unet_checkpoint(args.model_path)
    else:
        variables = load_pytree(args.model_path)
    model_fn = diffusion.wrap_model(lambda x, t: model.apply(variables, x, t, train=False))
    data = load_sc09_spectrogram_data(args.data_dir, args.batch_size)
    bpd = run_bpd_evaluation(model_fn, diffusion, data, args.num_samples,
                             args.clip_denoised, out_dir=args.out_dir)
    print(f"evaluation complete: mean total bpd {bpd:.5g}")
    return bpd


if __name__ == "__main__":
    main()
