"""Unconditional DiffWave sampling.

Rebuild of ``DiffWave_Unconditional/inference.py``: load the latest
checkpoint, run the full T-step ancestral reverse loop (here a single
compiled ``lax.scan``), write wavs, report wall-clock (the reference's only
perf instrumentation — CUDA events around the loop, ``:69-80``).
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-c", "--config", type=str, default="configs/config.json")
    p.add_argument("-n", "--num_samples", type=int, default=16)
    p.add_argument("--ckpt_path", type=str, default=None, help="orbax dir or torch .pkl")
    p.add_argument("--output_directory", type=str, default="speeches")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--use_pallas", type=int, default=1,
                   help="fused Pallas WaveNet forward for sampling (TPU only); 0 = plain XLA")
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ._common import load_diffwave_eps_fn
    from ..utils import audio_save

    ns = argparse.Namespace(ddpm_config=args.config, ddpm_path=args.ckpt_path,
                            use_pallas=args.use_pallas, bf16=args.bf16)
    # sampling is forward-only: fused Pallas stack when on TPU
    _, _, eps_fn, schedule = load_diffwave_eps_fn(ns, fast=bool(args.use_pallas))

    shape = (args.num_samples, 1, 16000)
    T = schedule.T

    def sample(rng):
        k0, k1 = jax.random.split(rng)
        x = jax.random.normal(k0, shape)
        keys = jax.random.split(k1, T)

        def body(x, inp):
            t, key = inp
            bsz = x.shape[0]
            eps = eps_fn(x, jnp.full((bsz,), t, dtype=jnp.float32))
            coef = (1.0 - schedule.alpha[t]) / schedule.sqrt_one_minus_alpha_bar[t]
            mu = (x - coef * eps) * jax.lax.rsqrt(schedule.alpha[t])
            z = jax.random.normal(key, x.shape)
            return jnp.where(t > 0, mu + schedule.sigma[t] * z, mu), None

        x, _ = jax.lax.scan(body, x, (jnp.arange(T - 1, -1, -1), keys))
        return x

    print(f"begin sampling, total number of reverse steps = {T}")
    from ..core.functional import jit_hoisted

    sample_jit = jit_hoisted(sample)
    sample_jit(jax.random.PRNGKey(args.seed)).block_until_ready()  # compile
    t0 = time.perf_counter()
    audio = sample_jit(jax.random.PRNGKey(args.seed + 1)).block_until_ready()
    dt = time.perf_counter() - t0
    print(f"generated {args.num_samples} utterances in {dt:.2f}s "
          f"({args.num_samples / dt:.2f} utt/s, {T} net calls)")

    os.makedirs(args.output_directory, exist_ok=True)
    for i in range(args.num_samples):
        audio_save(audio[i], args.output_directory, f"sample_{i:03d}.wav")
    print(f"wavs written to {args.output_directory}")
    return dt


if __name__ == "__main__":
    main()
