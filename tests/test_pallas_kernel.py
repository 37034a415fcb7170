"""Pallas fused residual block: interpret-mode parity on CPU."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_model_for_audio_defense_tpu.models import WaveNet
from diffusion_model_for_audio_defense_tpu.models.wavenet import wavenet_apply_pallas
from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_block import (
    fused_residual_block,
    reference_residual_block,
)


def _rand(rng, *shape, scale=0.1):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale)


def test_fused_block_matches_reference_interpret(rng_np):
    B, L, C = 2, 2000, 128
    h = _rand(rng_np, B, L, C)
    tb = _rand(rng_np, B, C)
    wd = _rand(rng_np, 3, C, 2 * C, scale=0.05)
    bd = _rand(rng_np, 2 * C)
    wrs = _rand(rng_np, C, 2 * C, scale=0.05)
    brs = _rand(rng_np, 2 * C)
    for d in (1, 8, 128, 1024):
        got_h, got_s = fused_residual_block(h, tb, wd, bd, wrs, brs, dilation=d, tile_l=1024, interpret=True)
        want_h, want_s = reference_residual_block(h, tb, wd, bd, wrs, brs, dilation=d)
        np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h), atol=3e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s), atol=3e-4, rtol=1e-3)


def test_wavenet_pallas_forward_matches_flax(rng_np):
    model = WaveNet(res_channels=128, skip_channels=128, num_res_layers=2, dilation_cycle=2,
                    diffusion_step_embed_dim_in=8, diffusion_step_embed_dim_mid=16,
                    diffusion_step_embed_dim_out=16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 2048)), jnp.zeros((1, 1)))
    # the output head is zero-initialized (reference ZeroConv1d) — randomize it
    # so the parity check is not vacuously 0 == 0
    import flax
    variables = flax.core.unfreeze(variables)
    fc2 = variables["params"]["final_conv2"]["Conv_0"]
    fc2["kernel"] = _rand(rng_np, *fc2["kernel"].shape)
    fc2["bias"] = _rand(rng_np, *fc2["bias"].shape)
    x = _rand(rng_np, 2, 1, 2048)
    t = jnp.asarray([[3.0], [7.0]])
    want = np.asarray(model.apply(variables, x, t))
    got = np.asarray(
        wavenet_apply_pallas(variables, x, t, num_res_layers=2, dilation_cycle=2,
                             dtype=jnp.float32, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_group_kernel_matches_reference_interpret(rng_np):
    from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_group import (
        fused_residual_group,
        reference_residual_group,
    )

    B, L, C, G = 2, 2000, 128, 4
    h = _rand(rng_np, B, L, C)
    tb = _rand(rng_np, G, B, C)
    wd = _rand(rng_np, G, 3, C, 2 * C, scale=0.05)
    bd = _rand(rng_np, G, 2 * C)
    wrs = _rand(rng_np, G, C, 2 * C, scale=0.05)
    brs = _rand(rng_np, G, 2 * C)
    dils = (1, 2, 4, 8)
    got_h, got_s = fused_residual_group(h, tb, wd, bd, wrs, brs, dilations=dils, tile_l=1024, interpret=True)
    want_h, want_s = reference_residual_group(h, tb, wd, bd, wrs, brs, dils)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s), atol=5e-4, rtol=1e-3)


def test_wavenet_pallas_grouped_bf16_interpret(rng_np):
    """Full pallas forward in bf16 (engages the fused group path) vs flax bf16."""
    model = WaveNet(res_channels=128, skip_channels=128, num_res_layers=4, dilation_cycle=2,
                    diffusion_step_embed_dim_in=8, diffusion_step_embed_dim_mid=16,
                    diffusion_step_embed_dim_out=16, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 2048)), jnp.zeros((1, 1)))
    import flax

    variables = flax.core.unfreeze(variables)
    fc2 = variables["params"]["final_conv2"]["Conv_0"]
    fc2["kernel"] = _rand(rng_np, *fc2["kernel"].shape)
    x = _rand(rng_np, 2, 1, 2048)
    t = jnp.asarray([[3.0], [7.0]])
    want = np.asarray(model.apply(variables, x, t))
    got = np.asarray(
        wavenet_apply_pallas(variables, x, t, num_res_layers=4, dilation_cycle=2,
                             dtype=jnp.bfloat16, interpret=True)
    )
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert np.abs(want).max() > 1e-4  # non-vacuous
    assert rel < 0.08, rel  # bf16 accumulation-order spread


def test_wavenet_use_pallas_groups_flag(rng_np):
    """The in-model flag path: same params, bf16, interpret-mode kernel."""
    import flax

    kw = dict(res_channels=128, skip_channels=128, num_res_layers=4, dilation_cycle=2,
              diffusion_step_embed_dim_in=8, diffusion_step_embed_dim_mid=16,
              diffusion_step_embed_dim_out=16, dtype=jnp.bfloat16)
    base = WaveNet(**kw)
    grouped = WaveNet(use_pallas_groups=True, pallas_interpret=True, **kw)
    variables = base.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 2048)), jnp.zeros((1, 1)))
    assert jax.tree.structure(variables) == jax.tree.structure(
        grouped.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 2048)), jnp.zeros((1, 1)))
    )
    variables = flax.core.unfreeze(variables)
    fc2 = variables["params"]["final_conv2"]["Conv_0"]
    fc2["kernel"] = _rand(rng_np, *fc2["kernel"].shape)
    x = _rand(rng_np, 2, 1, 2048)
    t = jnp.asarray([[3.0], [7.0]])
    a = np.asarray(base.apply(variables, x, t))
    b = np.asarray(grouped.apply(variables, x, t))
    assert np.abs(a).max() > 1e-4
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    assert rel < 0.08, rel


def test_fused_group_stack_matches_reference_interpret(rng_np):
    """Round-2 stack kernel: in-kernel skip accumulation + row-split pipeline."""
    from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_group import (
        reference_residual_group,
    )
    from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_stack import (
        fused_group_stack,
    )

    B, L, C, G = 2, 2000, 128, 4
    h = _rand(rng_np, B, L, C)
    skip0 = _rand(rng_np, B, L, C)  # nonzero running accumulator
    tb = _rand(rng_np, G, B, C)
    wd = _rand(rng_np, G, 3, C, 2 * C, scale=0.05)
    bd = _rand(rng_np, G, 2 * C)
    wrs = _rand(rng_np, G, C, 2 * C, scale=0.05)
    brs = _rand(rng_np, G, 2 * C)
    for dils, nsplit in [((1, 2, 4, 8), 2), ((16, 32, 64, 128), 1), ((512, 256, 2, 4), 3)]:
        got_h, got_s = fused_group_stack(
            h, skip0, tb, wd, bd, wrs, brs, dilations=dils, tile_l=1024,
            nsplit=nsplit, interpret=True,
        )
        want_h, want_s = reference_residual_group(h, tb, wd, bd, wrs, brs, dils)
        np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h), atol=5e-4, rtol=1e-3)
        np.testing.assert_allclose(
            np.asarray(got_s), np.asarray(skip0 + want_s), atol=5e-4, rtol=1e-3
        )


def test_stack_partition_plans():
    from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_stack import (
        stack_partition,
    )

    dils = [2 ** (n % 12) for n in range(36)]
    parts = stack_partition(dils)
    # covers 0..36 contiguously
    assert parts[0][0] == 0 and parts[-1][1] == 36
    assert all(a[1] == b[0] for a, b in zip(parts, parts[1:]))
    # measured-best plan: ALL singletons (zero halo overcompute),
    # big tile only where H=2048 forces it
    assert len(parts) == 36
    for s, e, tl in parts:
        assert e - s == 1
        assert tl == (2048 if dils[s] >= 2048 else 1024)
    # greedy fallback for non-production sequences
    parts2 = stack_partition([1, 2, 4, 8, 16])
    assert parts2[0][0] == 0 and parts2[-1][1] == 5


def test_wavenet_apply_stack_matches_flax(rng_np):
    from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_stack import (
        wavenet_apply_stack,
    )

    model = WaveNet(res_channels=128, skip_channels=128, num_res_layers=4, dilation_cycle=2,
                    diffusion_step_embed_dim_in=8, diffusion_step_embed_dim_mid=16,
                    diffusion_step_embed_dim_out=16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 2048)), jnp.zeros((1, 1)))
    import flax

    variables = flax.core.unfreeze(variables)
    fc2 = variables["params"]["final_conv2"]["Conv_0"]
    fc2["kernel"] = _rand(rng_np, *fc2["kernel"].shape)
    fc2["bias"] = _rand(rng_np, *fc2["bias"].shape)
    x = _rand(rng_np, 2, 1, 2048)
    t = jnp.asarray([[3.0], [7.0]])
    want = np.asarray(model.apply(variables, x, t))
    got = np.asarray(
        wavenet_apply_stack(variables, x, t, num_res_layers=4, dilation_cycle=2,
                            dtype=jnp.float32, interpret=True)
    )
    assert np.abs(want).max() > 1e-4
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_residual_block_ad_gradcheck(rng_np):
    """Pallas block VJP (wavenet_stack_bwd) vs jax.grad of the reference
    block, incl. edge masking (l_real < padded L) — interpret mode, f32."""
    from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_group import (
        reference_residual_group,
    )
    from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_stack import (
        residual_block_ad,
    )

    B, C, Lr, Lp, TL = 2, 128, 1500, 2048, 1024
    h0 = _rand(rng_np, B, Lp, C)
    h0 = h0.at[:, Lr:].set(0.0)
    skip0 = _rand(rng_np, B, Lp, C)
    tb = _rand(rng_np, B, C)
    wd = _rand(rng_np, 3, C, 2 * C, scale=0.05)
    bd = _rand(rng_np, 2 * C)
    wrs = _rand(rng_np, C, 2 * C, scale=0.05)
    brs = _rand(rng_np, 2 * C)

    for d in (1, 64, 512):
        def f(h, skip, tb, wd, bd, wrs, brs):
            h2, s2 = residual_block_ad(h, skip, tb, wd, bd, wrs, brs, d, TL, Lr, True)
            return jnp.sum(jnp.sin(h2[:, :Lr])) + jnp.sum(jnp.cos(s2[:, :Lr]))

        def fref(h, skip, tb, wd, bd, wrs, brs):
            h2, s2 = reference_residual_group(
                h[:, :Lr], tb[None], wd[None], bd[None], wrs[None], brs[None], (d,))
            return jnp.sum(jnp.sin(h2)) + jnp.sum(jnp.cos(skip[:, :Lr] + s2))

        g = jax.grad(f, argnums=tuple(range(7)))(h0, skip0, tb, wd, bd, wrs, brs)
        gr = jax.grad(fref, argnums=tuple(range(7)))(h0, skip0, tb, wd, bd, wrs, brs)
        for name, a, b in zip(["dh", "dskip", "dtb", "dwd", "dbd", "dwrs", "dbrs"], g, gr):
            a, b = np.asarray(a), np.asarray(b)
            if name in ("dh", "dskip"):
                a, b = a[:, :Lr], b[:, :Lr]
            rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
            assert rel < 2e-3, (d, name, rel)


def test_wavenet_apply_stack_differentiable_matches_flax_grads(rng_np):
    """Full differentiable stack (custom-VJP blocks + rematted cycles):
    param and input grads must match flax autodiff."""
    from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_stack import (
        wavenet_apply_stack,
    )
    import flax

    model = WaveNet(res_channels=128, skip_channels=128, num_res_layers=4, dilation_cycle=2,
                    diffusion_step_embed_dim_in=8, diffusion_step_embed_dim_mid=16,
                    diffusion_step_embed_dim_out=16)
    variables = flax.core.unfreeze(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 2048)), jnp.zeros((1, 1))))
    fc2 = variables["params"]["final_conv2"]["Conv_0"]
    fc2["kernel"] = _rand(rng_np, *fc2["kernel"].shape)
    x = _rand(rng_np, 2, 1, 2000)
    t = jnp.asarray([[3.0], [7.0]])

    def loss_stack(v, x):
        return jnp.sum(jnp.tanh(wavenet_apply_stack(
            v, x, t, num_res_layers=4, dilation_cycle=2, dtype=jnp.float32,
            differentiable=True, interpret=True)))

    def loss_flax(v, x):
        return jnp.sum(jnp.tanh(model.apply(v, x, t)))

    gv, gx = jax.grad(loss_stack, argnums=(0, 1))(variables, x)
    gvr, gxr = jax.grad(loss_flax, argnums=(0, 1))(variables, x)
    rel = lambda a, b: np.abs(np.asarray(a) - np.asarray(b)).max() / (np.abs(np.asarray(b)).max() + 1e-9)
    worst = max(jax.tree.leaves(jax.tree.map(rel, gv, gvr)))
    assert worst < 1e-3, worst
    assert rel(gx, gxr) < 1e-3


def test_residual_block_ad_x_gradcheck(rng_np):
    """Input-only Pallas VJP (residual_block_grad_x): waveform cotangents
    match the reference block's autodiff; parameter cotangents are zero by
    contract (attack mode) — interpret mode, f32."""
    from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_group import (
        reference_residual_group,
    )
    from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_stack import (
        residual_block_ad_x,
    )

    B, C, Lr, Lp, TL = 2, 128, 1500, 2048, 1024
    h0 = _rand(rng_np, B, Lp, C).at[:, Lr:].set(0.0)
    skip0 = _rand(rng_np, B, Lp, C)
    tb = _rand(rng_np, B, C)
    wd = _rand(rng_np, 3, C, 2 * C, scale=0.05)
    bd = _rand(rng_np, 2 * C)
    wrs = _rand(rng_np, C, 2 * C, scale=0.05)
    brs = _rand(rng_np, 2 * C)

    for d in (1, 64, 512):
        def f(h, skip, wd_):
            h2, s2 = residual_block_ad_x(h, skip, tb, wd_, bd, wrs, brs, d, TL, Lr, True)
            return jnp.sum(jnp.sin(h2[:, :Lr])) + jnp.sum(jnp.cos(s2[:, :Lr]))

        def fref(h, skip):
            h2, s2 = reference_residual_group(
                h[:, :Lr], tb[None], wd[None], bd[None], wrs[None], brs[None], (d,))
            return jnp.sum(jnp.sin(h2)) + jnp.sum(jnp.cos(skip[:, :Lr] + s2))

        gh, gs, gw = jax.grad(f, argnums=(0, 1, 2))(h0, skip0, wd)
        ghr, gsr = jax.grad(fref, argnums=(0, 1))(h0, skip0)
        for name, a, b in zip(["dh", "dskip"], (gh, gs), (ghr, gsr)):
            a, b = np.asarray(a)[:, :Lr], np.asarray(b)[:, :Lr]
            rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
            assert rel < 2e-3, (d, name, rel)
        assert np.abs(np.asarray(gw)).max() == 0.0  # attack-mode contract


def test_wavenet_apply_stack_grad_params_false_input_grads(rng_np):
    """Full differentiable stack in attack mode (grad_params=False): input
    gradients must match flax autodiff exactly; interpret mode, f32."""
    from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_stack import (
        wavenet_apply_stack,
    )
    import flax

    model = WaveNet(res_channels=128, skip_channels=128, num_res_layers=4, dilation_cycle=2,
                    diffusion_step_embed_dim_in=8, diffusion_step_embed_dim_mid=16,
                    diffusion_step_embed_dim_out=16)
    variables = flax.core.unfreeze(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 2048)), jnp.zeros((1, 1))))
    fc2 = variables["params"]["final_conv2"]["Conv_0"]
    fc2["kernel"] = _rand(rng_np, *fc2["kernel"].shape)
    x = _rand(rng_np, 2, 1, 2000)
    t = jnp.asarray([[3.0], [7.0]])

    def loss_stack(x):
        return jnp.sum(jnp.tanh(wavenet_apply_stack(
            variables, x, t, num_res_layers=4, dilation_cycle=2, dtype=jnp.float32,
            differentiable=True, grad_params=False, interpret=True)))

    def loss_flax(x):
        return jnp.sum(jnp.tanh(model.apply(variables, x, t)))

    gx = jax.grad(loss_stack)(x)
    gxr = jax.grad(loss_flax)(x)
    rel = np.abs(np.asarray(gx) - np.asarray(gxr)).max() / (np.abs(np.asarray(gxr)).max() + 1e-9)
    assert rel < 1e-3, rel
