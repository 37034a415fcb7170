"""Lab 21: UNet HBM-roofline close-out — bytes accounting (VERDICT r3 #5).

lab15 established the spec UNet forward is HBM-bound (B=256 bf16: 20.5 ms
MXU floor vs a ~40 ms bandwidth floor before the GN fix) with ~2.4 ms of
attention-adjacent copies left. This lab decides whether more bandwidth is
addressable or the roofline is effectively closed:

1.  XLA's own compiled-graph accounting (``compile().cost_analysis()``):
    flops + bytes accessed of the lowered forward.
2.  An analytical floor: parameter bytes + boundary IO + one write+read per
    *unfusable* producer→consumer edge (conv/matmul outputs — XLA cannot
    fuse two convs into one kernel, so each inter-conv activation must
    round-trip HBM once).
3.  The honest measured time (``timed_chain``) → achieved bytes/s against
    the v5e HBM peak (819 GB/s), and the addressable gap
    (measured_bytes − floor) in ms.

Verdict criterion: addressable gap < 10% of runtime ⇒ closed.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python perf/lab21_unet_bytes.py
"""

import jax
import jax.numpy as jnp

from diffusion_model_for_audio_defense_tpu.core.functional import (
    enable_compilation_cache,
)
from diffusion_model_for_audio_defense_tpu.models.unet import create_unet

B = 256
HBM_PEAK_GBS = 819.0  # v5e


def analytical_floor_bytes(variables, B):
    """Minimal HBM traffic for one forward at batch B, bf16 activations.

    Counts: every parameter read once; input+output at the boundary; and for
    each conv/dense/attention producer, one activation write + one read by
    its consumer (elementwise/GN/softmax stages fuse into neighbors; convs
    and matmuls cannot fuse into each other). Skip connections add one extra
    read per stored tensor (written once at the down path, read at the up
    path concat).
    """
    # parameters: read once per forward
    param_bytes = sum(x.size * 2 for x in jax.tree.leaves(variables))  # bf16 compute copies

    # activation plan for the default 32×32 / 128ch / mult (1,2,2,2) / 3RB
    # UNet: enumerate (H*W, C) for every conv output on the down/mid/up path.
    ch, mults, rb = 128, (1, 2, 2, 2), 3
    acts = []  # (elements,) per conv-ish output
    skips = []
    hw = 32 * 32
    c = ch
    acts.append(hw * c)  # in_conv
    skips.append(hw * c)
    attn_ds = (2, 4)
    ds = 1
    for li, m in enumerate(mults):
        for _ in range(rb):
            c = ch * m
            # ResBlock: in_conv, emb Dense (B,2c — negligible), out_conv
            acts += [hw * c, hw * c]
            if ds in attn_ds:
                # qkv proj, 2 einsums, out proj
                t = hw
                acts += [t * 3 * c, 4 * (t * t // 1), t * c, t * c]
            skips.append(hw * c)
        if li != len(mults) - 1:
            ds *= 2
            hw //= 4
            acts.append(hw * c)  # downsample conv
            skips.append(hw * c)
    # middle: res + attn + res at the bottom resolution
    acts += [hw * c, hw * c, t * 3 * c, t * c, t * c, hw * c, hw * c]
    # up path mirrors down with rb+1 blocks and concat reads of the skips
    for li, m in enumerate(reversed(mults)):
        for _ in range(rb + 1):
            c = ch * m
            acts += [hw * c, hw * c]
            if ds in attn_ds:
                t = hw
                acts += [t * 3 * c, t * c, t * c]
        if li != len(mults) - 1:
            ds //= 2
            hw *= 4
            acts.append(hw * c)  # upsample conv
    act_elems = sum(acts)
    skip_elems = sum(skips)  # one extra read each at the concat
    act_bytes = B * (act_elems * 2 * 2 + skip_elems * 2)  # write+read, bf16
    io_bytes = B * (32 * 32 * 1 * 4) * 2  # f32 boundary in/out
    return param_bytes + act_bytes + io_bytes


def main():
    enable_compilation_cache()
    from perf._timing import timed_chain

    unet = create_unet(dtype=jnp.bfloat16)
    spec = jax.random.normal(jax.random.PRNGKey(0), (B, 1, 32, 32))
    t = jnp.zeros((B,))
    variables = unet.init(jax.random.PRNGKey(1), spec[:1], t[:1])

    fwd = lambda s: unet.apply(variables, s, t)
    # params as explicit args for the cost analysis — the same HLO shape
    # jit_hoisted produces at runtime (jit_hoisted's wrapper has no .lower)
    lowered = jax.jit(lambda v, s: unet.apply(v, s, t)).lower(variables, spec)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = ca.get("flops", float("nan"))
    xla_bytes = ca.get("bytes accessed", float("nan"))
    print(f"XLA cost_analysis: {flops/1e12:.2f} TF, {xla_bytes/1e9:.2f} GB accessed")

    floor = analytical_floor_bytes(variables, B)
    print(f"analytical floor: {floor/1e9:.2f} GB "
          f"(params {sum(x.size*2 for x in jax.tree.leaves(variables))/1e6:.0f} MB)")

    per = timed_chain(fwd, spec, label=f"unet fwd bf16 B={B}")
    measured_gbs = xla_bytes / per / 1e9
    floor_ms = floor / HBM_PEAK_GBS / 1e6
    gap_ms = (xla_bytes - floor) / HBM_PEAK_GBS / 1e6
    print(f"measured: {per*1e3:.2f} ms -> {B/per:.0f} spec/s; "
          f"achieved {measured_gbs:.0f} GB/s of {HBM_PEAK_GBS:.0f} peak")
    print(f"floors: BW {floor_ms:.1f} ms, MXU {flops/197e12*1e3:.1f} ms")
    print(f"addressable gap (XLA bytes - floor at peak BW): {gap_ms:.2f} ms "
          f"= {100*gap_ms/(per*1e3):.1f}% of runtime")
    verdict = "CLOSED (<10% addressable)" if gap_ms < 0.1 * per * 1e3 else "OPEN"
    print(f"verdict: {verdict}")


if __name__ == "__main__":
    main()
