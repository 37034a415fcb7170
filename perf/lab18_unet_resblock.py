"""Lab 18: fused Pallas UNet ResBlock vs XLA (spec domain, round 3).

Motivated by lab15's "HBM-bound" read of the UNet forward. Outcome, with
HONEST chained timing (see perf/_timing.py — ``block_until_ready`` does
not synchronize through axon, which had made standalone ResBlock numbers
meaningless):

    ResBlock 16x16 256ch B=256 bf16:  XLA 0.87 ms (178 TF/s ≈ 90% peak)
                                      Pallas 1.22 ms (126 TF/s) → 0.71x
    ResBlock 32x32 128ch B=256 bf16:  XLA 0.92 ms (168 TF/s)
                                      Pallas 1.97 ms (78 TF/s)  → 0.47x

**Negative result, kernel ships unused**: XLA's conv lowering already
runs the production ResBlock at ~90% of v5e bf16 peak (the conv FLOP
floor is 0.78 ms — at most ~12% headroom exists), so a fused kernel
cannot meaningfully win; the round-2 WaveNet situation (XLA at ~50%,
Pallas stack 2x) does not repeat here. The kernel + parity tests stay in
tree (`ops/pallas/unet_resblock.py`, tests/test_unet_resblock_kernel.py)
as the documented experiment.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python perf/lab18_unet_resblock.py
"""
import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent))
from _timing import timed_chain

from diffusion_model_for_audio_defense_tpu.core.functional import enable_compilation_cache
from diffusion_model_for_audio_defense_tpu.models.unet import ResBlock
from diffusion_model_for_audio_defense_tpu.ops.pallas.unet_resblock import fused_resblock

enable_compilation_cache()
rng = np.random.default_rng(0)
B = 256


def case(H, W, Cin, Cout):
    print(f"ResBlock {H}x{W} {Cin}->{Cout} B={B} bf16", flush=True)
    blk = ResBlock(Cout, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((B, H, W, Cin)), jnp.bfloat16)
    emb = jnp.asarray(rng.standard_normal((B, 512)), jnp.float32)
    p = blk.init(jax.random.PRNGKey(0), x[:1].astype(jnp.float32), emb[:1])["params"]
    p["out_conv"]["kernel"] = jnp.asarray(
        rng.standard_normal(p["out_conv"]["kernel"].shape), jnp.float32) * 0.1
    emb_out = jnp.dot(jax.nn.silu(emb), p["emb_proj"]["kernel"]) + p["emb_proj"]["bias"]
    kw = {}
    if Cin != Cout:
        # chain shape-changing blocks via a fixed 1x1 projection back (same
        # tiny cost added to both sides)
        proj = jnp.asarray(rng.standard_normal((Cout, Cin)) * 0.05, jnp.bfloat16)
        back = lambda h: jnp.einsum("bhwc,cd->bhwd", h, proj)
        kw = dict(skip_w=p["skip"]["kernel"], skip_b=p["skip"]["bias"])
    else:
        back = lambda h: h

    d_x = timed_chain(
        lambda h: back(blk.apply({"params": p}, h, emb)), x, label="xla ")
    d_p = timed_chain(
        lambda h: back(fused_resblock(
            h, emb_out,
            p["in_norm"]["scale"], p["in_norm"]["bias"],
            p["in_conv"]["kernel"], p["in_conv"]["bias"],
            p["out_norm"]["scale"], p["out_norm"]["bias"],
            p["out_conv"]["kernel"], p["out_conv"]["bias"],
            skip_w=kw.get("skip_w"), skip_b=kw.get("skip_b"))), x, label="plas")

    flops = 2 * B * H * W * 9 * (Cin * Cout + Cout * Cout) * 2
    print(f"  speedup {d_x/d_p:.2f}x | xla {flops/d_x/1e12:.0f} TF/s, "
          f"plas {flops/d_p/1e12:.0f} TF/s", flush=True)


def main():
    case(32, 32, 128, 128)   # down level 0
    case(16, 16, 256, 256)   # down levels 1-3 / mid
    case(16, 16, 128, 256)   # level transition (skip Dense)
    case(32, 32, 384, 128)   # up level 0 (post-concat)


if __name__ == "__main__":
    main()
