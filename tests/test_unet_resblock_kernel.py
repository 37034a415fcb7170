"""Parity tests for the fused Pallas UNet ResBlock kernel (interpret mode).

The kernel is an optional path (perf/lab18 found XLA already at ~90% of
v5e bf16 peak on the production ResBlock shapes, so it ships unused); the
tests keep it honest against the flax ResBlock, including the skip-Dense
branch and non-square spatial dims.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_for_audio_defense_tpu.models.unet import ResBlock
from diffusion_model_for_audio_defense_tpu.ops.pallas.unet_resblock import fused_resblock

rng = np.random.default_rng(0)


def _run(B, H, W, Cin, Cout, bB=None):
    blk = ResBlock(Cout)
    x = jnp.asarray(rng.standard_normal((B, H, W, Cin)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((B, 64)), jnp.float32)
    variables = blk.init(jax.random.PRNGKey(0), x, emb)
    p = variables["params"]
    # the out conv is zero-init; parity would be vacuous without randomizing
    p["out_conv"]["kernel"] = jnp.asarray(
        rng.standard_normal(p["out_conv"]["kernel"].shape), jnp.float32) * 0.1
    ref = blk.apply({"params": p}, x, emb)

    emb_out = jnp.dot(jax.nn.silu(emb), p["emb_proj"]["kernel"]) + p["emb_proj"]["bias"]
    kw = {}
    if Cin != Cout:
        kw = dict(skip_w=p["skip"]["kernel"], skip_b=p["skip"]["bias"])
    out = fused_resblock(
        x, emb_out,
        p["in_norm"]["scale"], p["in_norm"]["bias"],
        p["in_conv"]["kernel"], p["in_conv"]["bias"],
        p["out_norm"]["scale"], p["out_norm"]["bias"],
        p["out_conv"]["kernel"], p["out_conv"]["bias"],
        compute_dtype=jnp.float32, interpret=True, batch_block=bB, **kw,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize(
    "B,H,W,Cin,Cout,bB",
    [
        (4, 8, 8, 32, 32, None),   # identity residual
        (4, 8, 8, 32, 64, 2),      # skip Dense + channel growth
        (2, 16, 8, 96, 32, None),  # non-square spatial, channel shrink
        (3, 4, 4, 64, 64, 1),      # smallest production spatial, odd batch
    ],
)
def test_fused_resblock_parity(B, H, W, Cin, Cout, bB):
    _run(B, H, W, Cin, Cout, bB)


def test_skip_arg_validation():
    x = jnp.zeros((2, 4, 4, 8))
    emb_out = jnp.zeros((2, 16))
    v = jnp.zeros((8,))
    w = jnp.zeros((3, 3, 8, 8))
    with pytest.raises(ValueError, match="skip_w"):
        fused_resblock(x, emb_out, v, v, w, v, v, v, w, v,
                       skip_w=jnp.zeros((8, 8)), skip_b=v, interpret=True)
