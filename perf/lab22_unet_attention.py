"""Lab 22: fused Pallas UNet attention on the real TPU — verify + measure.

lab21 left the UNet HBM roofline OPEN: 25.1 GB moved vs an 8.1 GB floor at
B=256 bf16 (35.6 ms, 86% of HBM peak). The largest addressable chunk is
attention — XLA materializes the (B,h,T,T) scores through HBM and spends
~2.4 ms/fwd on head-split copies (lab15). ``ops/pallas/unet_attention.py``
keeps scores in VMEM and reads q/k/v as lane slices of the fused qkv.

This lab, on the real v5e chip:
1. parity: einsum vs pallas UNet forward at B=8 (randomized params — the
   zero-init proj_out makes init-param parity vacuous), and grad
   finiteness through the pallas path (custom-VJP einsum recompute);
2. honest ``timed_chain`` of the full production UNet forward
   (128ch/3RB/heads4, 32×32) at B=256 bf16, einsum vs pallas;
3. XLA cost-analysis bytes of both variants (same accounting as lab21).

Usage: cd /root/repo && python perf/lab22_unet_attention.py
"""

import time

import jax
import jax.numpy as jnp

from diffusion_model_for_audio_defense_tpu.core.functional import (
    enable_compilation_cache,
)
from diffusion_model_for_audio_defense_tpu.models.unet import create_unet

B = 256


def randomized(variables, scale=0.05):
    leaves, tdef = jax.tree.flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    return jax.tree.unflatten(
        tdef, [jax.random.normal(k, l.shape, l.dtype) * scale for k, l in zip(keys, leaves)]
    )


def main():
    enable_compilation_cache()
    from perf._timing import timed_chain

    print(f"devices: {jax.devices()}", flush=True)
    u0 = create_unet(dtype=jnp.bfloat16)
    u1 = create_unet(dtype=jnp.bfloat16, use_pallas_attention=True)
    t = jnp.zeros((B,))
    x8 = jax.random.normal(jax.random.PRNGKey(0), (8, 1, 32, 32))
    v = randomized(u0.init(jax.random.PRNGKey(1), x8[:1], t[:1]))

    # --- 1. parity + grad (B=8, bf16) -------------------------------------
    t8 = jnp.zeros((8,))
    f0 = jax.jit(lambda v, s: u0.apply(v, s, t8))
    f1 = jax.jit(lambda v, s: u1.apply(v, s, t8))
    y0, y1 = f0(v, x8), f1(v, x8)
    err = float(jnp.max(jnp.abs(y0 - y1)))
    ref = float(jnp.max(jnp.abs(y0)))
    print(f"parity B=8 bf16: max|Δ|={err:.3e} vs max|y|={ref:.3e}", flush=True)
    assert ref > 1e-3, "vacuous parity (output head still zero?)"
    assert err < 5e-2 * max(ref, 1.0), "pallas/einsum mismatch"

    g = jax.jit(jax.grad(lambda s: jnp.sum(jnp.square(u1.apply(v, s, t8)))))(x8)
    gfin = bool(jnp.isfinite(g).all())
    print(f"grad through pallas path finite: {gfin}", flush=True)
    assert gfin

    # --- 2. honest timing (B=256, bf16) ------------------------------------
    spec = jax.random.normal(jax.random.PRNGKey(2), (B, 1, 32, 32))
    per = {}
    for name, u in (("einsum", u0), ("pallas", u1)):
        step = lambda x, u=u: (x[0], u.apply(x[0], x[1], t))
        per[name] = timed_chain(step, (v, spec), label=f"unet fwd bf16 B={B} {name}")
    print(
        f"RESULT: einsum {per['einsum']*1e3:.2f} ms vs pallas {per['pallas']*1e3:.2f} ms "
        f"({per['einsum']/per['pallas']:.2f}x; {B/per['pallas']:.0f} spec/s pallas)",
        flush=True,
    )

    # --- 3. bytes accounting ------------------------------------------------
    for name, u in (("einsum", u0), ("pallas", u1)):
        ca = jax.jit(lambda v, s, u=u: u.apply(v, s, t)).lower(v, spec).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        print(
            f"cost_analysis {name}: {ca.get('flops', float('nan'))/1e12:.2f} TF, "
            f"{ca.get('bytes accessed', float('nan'))/1e9:.2f} GB accessed",
            flush=True,
        )


if __name__ == "__main__":
    main()
