"""Fused Pallas UNet attention (ops/pallas/unet_attention.py) vs the einsum
path — interpret mode on CPU.

The reference attention is ``improved_diffusion/unet.py`` QKVAttention
(rebuilt at ``models/unet.py:100-128``). The kernel must match it bit-for-
math (f32 softmax, compute-dtype matmul operands) at the production shapes
(T, d) ∈ {(256, 64), (64, 64)} and fall back cleanly elsewhere.

Vacuousness guard: the UNet's attention ``proj_out`` is ZERO-initialized —
with init params every attention block is an identity and any parity check
passes trivially (same trap as the WaveNet/UNet output heads, CLAUDE.md).
Model-level tests here randomize every parameter leaf.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_for_audio_defense_tpu.models.unet import create_unet
from diffusion_model_for_audio_defense_tpu.ops.pallas.unet_attention import (
    attention_core,
    fused_qkv_attention,
    supports,
)


def test_supports_table():
    assert supports(256, 256, 4)  # prod ds=2 (128ch × mult 2, 4 heads)
    assert supports(64, 256, 4)   # prod ds=4
    assert supports(256, 128, 2)  # d=64 via fewer heads
    assert not supports(256, 128, 4)  # d=32: lane slices unaligned
    assert not supports(16, 32, 4)    # tiny test config
    assert not supports(250, 256, 4)  # T not sublane-aligned
    assert not supports(256, 255, 4)  # C not divisible by heads


@pytest.mark.parametrize("T,C,h", [(256, 256, 4), (64, 256, 4), (32, 128, 2)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_kernel_matches_core(T, C, h, dtype):
    qkv = jax.random.normal(jax.random.PRNGKey(0), (3, T, 3 * C)).astype(dtype)
    ref = attention_core(qkv, h)
    out = fused_qkv_attention(qkv, h, True)
    assert out.dtype == ref.dtype
    tol = 1e-6 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=tol, rtol=tol
    )


def test_kernel_grad_matches_core():
    qkv = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 3 * 256))
    f1 = lambda x: jnp.sum(jnp.sin(fused_qkv_attention(x, 4, True)))
    f2 = lambda x: jnp.sum(jnp.sin(attention_core(x, 4)))
    g1, g2 = jax.grad(f1)(qkv), jax.grad(f2)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6, rtol=1e-5)


def _randomized(variables, scale=0.05):
    """Random values in every leaf — zero-init heads make parity vacuous."""
    leaves, tdef = jax.tree.flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    return jax.tree.unflatten(
        tdef, [jax.random.normal(k, l.shape, l.dtype) * scale for k, l in zip(keys, leaves)]
    )


def test_unet_forward_and_grad_parity():
    # heads=2 at 64ch → attention channels 128, d=64: the kernel engages at
    # every attention block (verified by supports(·,128,2) above)
    kw = dict(num_channels=64, num_res_blocks=1, num_heads=2)
    u0 = create_unet(**kw)
    u1 = create_unet(**kw, use_pallas_attention=True, pallas_interpret=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 32, 32))
    t = jnp.array([3.0])
    v = _randomized(u0.init(jax.random.PRNGKey(1), x, t))

    y0, y1 = u0.apply(v, x, t), u1.apply(v, x, t)
    assert float(jnp.max(jnp.abs(y0))) > 1e-3  # non-vacuous
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5, rtol=1e-4)

    g0 = jax.grad(lambda xx: jnp.sum(jnp.square(u0.apply(v, xx, t))))(x)
    g1 = jax.grad(lambda xx: jnp.sum(jnp.square(u1.apply(v, xx, t))))(x)
    assert float(jnp.max(jnp.abs(g0))) > 1e-5
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=1e-6, rtol=1e-4)


def test_unsupported_shape_falls_back():
    # d=32 → supports() is False → beneath the flag both models run the
    # einsum path; outputs must agree exactly
    kw = dict(num_channels=64, num_res_blocks=1, num_heads=4)
    u0 = create_unet(**kw)
    u1 = create_unet(**kw, use_pallas_attention=True, pallas_interpret=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 32, 32))
    t = jnp.array([5.0])
    v = _randomized(u0.init(jax.random.PRNGKey(1), x, t))
    np.testing.assert_array_equal(
        np.asarray(u0.apply(v, x, t)), np.asarray(u1.apply(v, x, t))
    )
