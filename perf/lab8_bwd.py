"""Lab 8: WaveNet fwd+bwd timing — XLA AD vs the differentiable Pallas stack.

Measures the adaptive-attack / training gradient path (reference
``white_box_attack.py`` backprop through the purifier): value_and_grad of a
scalar loss over the WaveNet forward, B=16, L=16000, bf16 compute.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python perf/lab8_bwd.py [which]
  which ∈ {xla, pallas, pallas_remat, all (default)}
"""
import sys
import time

import jax
import jax.numpy as jnp

from diffusion_model_for_audio_defense_tpu.models import WaveNet
from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_stack import wavenet_apply_stack

B, L = 16, 16000


def bench(name, f, *args, iters=10):
    t0 = time.time()
    out = f(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters * 1e3
    print(f"{name}: {dt:.1f} ms/iter (compile {compile_s:.0f}s)", flush=True)
    return dt


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    wn = WaveNet(dtype=jnp.bfloat16)
    wn_vars = wn.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 16000)), jnp.zeros((1, 1)))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 1, L), jnp.float32) * 0.1
    t = jnp.full((B, 1), 25, jnp.float32)

    if which in ("xla", "all"):
        def loss_xla(xx):
            return jnp.sum(wn.apply(wn_vars, xx, t) ** 2)
        g_xla = jax.jit(jax.value_and_grad(loss_xla))
        bench("xla_ad fwd+bwd", g_xla, x)

    if which in ("pallas", "all"):
        def loss_pl(xx):
            return jnp.sum(wavenet_apply_stack(wn_vars, xx, t, differentiable=True) ** 2)
        g_pl = jax.jit(jax.value_and_grad(loss_pl))
        bench("pallas_ad fwd+bwd", g_pl, x)

    if which in ("pallas_x", "all"):
        def loss_px(xx):
            return jnp.sum(wavenet_apply_stack(
                wn_vars, xx, t, differentiable=True, grad_params=False) ** 2)
        g_px = jax.jit(jax.value_and_grad(loss_px))
        bench("pallas_x fwd+bwd (input grads only)", g_px, x)

    if which in ("xla_params", "all"):
        def loss_xp(v, xx):
            return jnp.sum(wn.apply(v, xx, t) ** 2)
        g_xp = jax.jit(jax.value_and_grad(loss_xp, argnums=(0, 1)))
        bench("xla_ad fwd+bwd (param+input grads)", g_xp, wn_vars, x)

    if which in ("pallas_remat", "all"):
        def loss_plr(xx):
            return jnp.sum(wavenet_apply_stack(
                wn_vars, xx, t, differentiable=True, remat_cycles=True) ** 2)
        g_plr = jax.jit(jax.value_and_grad(loss_plr))
        bench("pallas_ad_remat fwd+bwd", g_plr, x)



def f32_compare():
    """f32 attack-path comparison (the CLI default dtype)."""
    wn = WaveNet()  # f32
    wn_vars = wn.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 16000)), jnp.zeros((1, 1)))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 1, L), jnp.float32) * 0.1
    t = jnp.full((B, 1), 25, jnp.float32)

    def loss_xla(xx):
        return jnp.sum(wn.apply(wn_vars, xx, t) ** 2)
    bench("f32 xla_ad fwd+bwd", jax.jit(jax.value_and_grad(loss_xla)), x)

    # B=16 f32 pre-stash is 19 GB — remat_cycles bounds it on the 16 GB chip
    def loss_px(xx):
        return jnp.sum(wavenet_apply_stack(
            wn_vars, xx, t, dtype=jnp.float32, differentiable=True, grad_params=False,
            remat_cycles=True) ** 2)
    bench("f32 pallas_x+remat fwd+bwd", jax.jit(jax.value_and_grad(loss_px)), x)

    # attack-realistic batch: stash fits without remat
    x4, t4 = x[:4], t[:4]
    def loss_xla4(xx):
        return jnp.sum(wn.apply(wn_vars, xx, t4) ** 2)
    bench("f32 B=4 xla_ad fwd+bwd", jax.jit(jax.value_and_grad(loss_xla4)), x4)
    def loss_px4(xx):
        return jnp.sum(wavenet_apply_stack(
            wn_vars, xx, t4, dtype=jnp.float32, differentiable=True, grad_params=False) ** 2)
    bench("f32 B=4 pallas_x fwd+bwd", jax.jit(jax.value_and_grad(loss_px4)), x4)


if __name__ == "__main__":
    if sys.argv[1:2] == ["f32"]:
        f32_compare()
    else:
        main()
