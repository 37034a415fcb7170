"""Sample a batch of spectrograms/images from a trained diffusion UNet.

Rebuild of ``Improved_Diffusion_Unconditional/scripts/image_sample.py:1-106``
and ``scripts/super_res_sample.py:1-117`` as one driver:

- plain mode: ancestral (``p_sample_loop``) or DDIM (``--use_ddim``) sampling
  from noise; the loops are single jitted ``lax.scan`` programs (the
  reference steps t on host), with the sample batch sharded over a dp mesh
  when more than one device is visible — replacing the reference's
  one-process-per-GPU ``dist.all_gather`` accumulation
- ``--super_res``: condition a ``SuperResModel`` on low-res samples from a
  prior run's npz (``--base_samples``), reference ``super_res_sample.py:76-99``

Outputs ``samples_{shape}.npz`` of uint8 NHWC arrays exactly like the
reference (``image_sample.py:74-86``). ``--save_mel_png`` additionally
renders the first few samples through ``utils.spec_save`` for eyeballing.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from .spectrogram_train import model_and_diffusion_defaults


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    defaults = dict(
        clip_denoised=True, num_samples=64, batch_size=16, use_ddim=False,
        model_path="", out_dir="samples", seed=0,
        super_res=False, base_samples="", large_size=64, small_size=32,
        save_mel_png=0,
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


def _pattn(args) -> bool:
    """Fused Pallas attention gate: TPU backend only (the kernel uses
    pltpu.CompilerParams — ADVICE r4), opt-out via --no_pallas_attention."""
    return jax.default_backend() == "tpu" and not args.no_pallas_attention


def _load_variables(path, model, example_args):
    from ..core.checkpoint import load_pytree, load_unet_checkpoint

    if path and os.path.isdir(path):
        return load_pytree(path)
    if path and os.path.isfile(path):
        return load_unet_checkpoint(path)
    import sys

    print(f"[warn] UNet checkpoint not found at {path!r}; using random init", file=sys.stderr)
    return model.init(jax.random.PRNGKey(0), *example_args)


def _to_uint8_nhwc(sample):
    arr = np.asarray(jnp.clip((sample + 1) * 127.5, 0, 255).astype(jnp.uint8))
    return np.transpose(arr, (0, 2, 3, 1))  # NCHW → NHWC like the reference


def _batch_sharding(batch_size: int):
    """Shard the sample batch over every visible device (dp) — GSPMD splits
    the whole reverse scan with zero collectives (samples are independent).
    Skipped when the batch doesn't divide the device count."""
    devs = jax.devices()
    if len(devs) == 1 or batch_size % len(devs) != 0:
        return None
    from ..parallel import data_shard, device_mesh

    return data_shard(device_mesh(("dp",)))


def sample_plain(args, log=print):
    from ..models.unet import create_unet
    from ..purify.diffusion_math import create_gaussian_diffusion

    model = create_unet(
        image_size=args.image_size, num_channels=args.num_channels,
        num_res_blocks=args.num_res_blocks, learn_sigma=args.learn_sigma,
        attention_resolutions=args.attention_resolutions, dropout=args.dropout,
        num_heads=args.num_heads, num_heads_upsample=args.num_heads_upsample,
        use_scale_shift_norm=args.use_scale_shift_norm,
        # fused Pallas attention on TPU (perf/lab22); per-block shape guard
        # in AttentionBlock means non-production widths just fall back
        use_pallas_attention=_pattn(args),
    )
    diffusion = create_gaussian_diffusion(
        steps=args.diffusion_steps, learn_sigma=args.learn_sigma, sigma_small=args.sigma_small,
        noise_schedule=args.noise_schedule, use_kl=args.use_kl,
        predict_xstart=args.predict_xstart, rescale_timesteps=args.rescale_timesteps,
        rescale_learned_sigmas=args.rescale_learned_sigmas,
        timestep_respacing=args.timestep_respacing,
    )
    shape = (args.batch_size, 1, args.image_size, args.image_size)
    variables = _load_variables(args.model_path, model,
                                (jnp.zeros(shape[:1] + shape[1:]), jnp.zeros((shape[0],))))
    loop = diffusion.ddim_sample_loop if args.use_ddim else diffusion.p_sample_loop
    sharding = _batch_sharding(args.batch_size)

    # variables threaded as a runtime arg (replicated on the mesh): baked
    # closure params inflate the program by the full weight size and slow
    # compiles ~10x (core/functional.py)
    def run(variables, noise, rng):
        model_fn = diffusion.wrap_model(lambda x, t: model.apply(variables, x, t, train=False))
        return loop(model_fn, rng=rng, x_t=noise, t_start=diffusion.num_timesteps,
                    clip_denoised=args.clip_denoised)

    run = jax.jit(run, in_shardings=(None, sharding, None)) if sharding else jax.jit(run)
    rng = jax.random.PRNGKey(args.seed)
    outs = []
    while len(outs) * args.batch_size < args.num_samples:
        rng, kn, ks = jax.random.split(rng, 3)
        noise = jax.random.normal(kn, shape)
        if sharding is not None:
            noise = jax.device_put(noise, sharding)
        outs.append(_to_uint8_nhwc(run(variables, noise, ks)))
        log(f"created {len(outs) * args.batch_size} samples")
    return np.concatenate(outs, axis=0)[: args.num_samples]


def load_base_samples(path, batch_size):
    """Low-res conditioning batches from a prior ``image_sample`` npz
    (reference ``super_res_sample.py:76-99``); yields float NCHW in [-1,1]."""
    image_arr = np.load(path)["arr_0"]  # (N, H, W, C) uint8
    buffer = []
    while True:
        for img in image_arr:
            buffer.append(img)
            if len(buffer) == batch_size:
                batch = np.stack(buffer).astype(np.float32) / 127.5 - 1.0
                yield np.transpose(batch, (0, 3, 1, 2))
                buffer = []


def sample_super_res(args, log=print):
    from ..models.unet import SuperResModel
    from ..purify.diffusion_math import create_gaussian_diffusion

    if args.large_size == 256:
        channel_mult = (1, 1, 2, 2, 4, 4)
    elif args.large_size == 64:
        channel_mult = (1, 2, 3, 4)
    else:
        channel_mult = (1, 2, 2, 2)
    attn_ds = tuple(args.large_size // int(r) for r in args.attention_resolutions.split(","))
    model = SuperResModel(
        in_channels=1, model_channels=args.num_channels,
        out_channels=1 * (2 if args.learn_sigma else 1),
        num_res_blocks=args.num_res_blocks, attention_resolutions=attn_ds,
        dropout=args.dropout, channel_mult=channel_mult, num_heads=args.num_heads,
        num_heads_upsample=args.num_heads_upsample,
        use_scale_shift_norm=args.use_scale_shift_norm,
    )
    diffusion = create_gaussian_diffusion(
        steps=args.diffusion_steps, learn_sigma=args.learn_sigma, sigma_small=args.sigma_small,
        noise_schedule=args.noise_schedule, rescale_timesteps=args.rescale_timesteps,
        rescale_learned_sigmas=args.rescale_learned_sigmas,
        timestep_respacing=args.timestep_respacing,
    )
    shape = (args.batch_size, 1, args.large_size, args.large_size)
    small = (args.batch_size, 1, args.small_size, args.small_size)
    variables = _load_variables(
        args.model_path, model,
        (jnp.zeros(shape), jnp.zeros((shape[0],)), jnp.zeros(small)))
    sharding = _batch_sharding(args.batch_size)

    def run(variables, noise, low_res, rng):
        model_fn = diffusion.wrap_model(
            lambda x, t: model.apply(variables, x, t, low_res=low_res, train=False))
        loop = diffusion.ddim_sample_loop if args.use_ddim else diffusion.p_sample_loop
        return loop(model_fn, rng=rng, x_t=noise, t_start=diffusion.num_timesteps,
                    clip_denoised=args.clip_denoised)

    run = jax.jit(run, in_shardings=(None, sharding, sharding, None)) if sharding else jax.jit(run)
    if not args.base_samples:
        raise SystemExit("--super_res requires --base_samples (npz from a prior image_sample run)")
    data = load_base_samples(args.base_samples, args.batch_size)
    rng = jax.random.PRNGKey(args.seed)
    outs = []
    while len(outs) * args.batch_size < args.num_samples:
        low = jnp.asarray(next(data))
        rng, kn, ks = jax.random.split(rng, 3)
        noise = jax.random.normal(kn, shape)
        if sharding is not None:
            noise = jax.device_put(noise, sharding)
            low = jax.device_put(low, sharding)
        outs.append(_to_uint8_nhwc(run(variables, noise, low, ks)))
        log(f"created {len(outs) * args.batch_size} samples")
    return np.concatenate(outs, axis=0)[: args.num_samples]


def main(argv=None):
    args = build_parser().parse_args(argv)
    arr = sample_super_res(args) if args.super_res else sample_plain(args)
    os.makedirs(args.out_dir, exist_ok=True)
    shape_str = "x".join(str(s) for s in arr.shape)
    out_path = os.path.join(args.out_dir, f"samples_{shape_str}.npz")
    np.savez(out_path, arr)
    print(f"saved {out_path}")
    if args.save_mel_png:
        from ..utils import spec_save

        for i in range(min(int(args.save_mel_png), arr.shape[0])):
            # undo the uint8 quantization back to standardized [-1,1] mel
            spec = arr[i].astype(np.float32) / 127.5 - 1.0
            spec_save(np.transpose(spec, (2, 0, 1)), args.out_dir, f"sample_{i}.png")
    return out_path


if __name__ == "__main__":
    main()
