"""Preset-table consistency for the real-weights pipeline scripts.

scripts/train_real_{diffwave,spec}.py run for hours; a preset missing a key
would KeyError deep into the run (e.g. at the eval stage after training
completed). Every preset must carry exactly the keys the stages consume,
and the reduced presets must describe a buildable model.
"""

import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "scripts", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def diffwave_mod():
    return _load("train_real_diffwave")


@pytest.fixture(scope="module")
def spec_mod():
    return _load("train_real_spec")


def test_diffwave_presets_same_keys(diffwave_mod):
    presets = diffwave_mod.PRESETS
    assert set(presets) == {"prod", "cpu", "smoke"}
    keys = {name: set(cfg) for name, cfg in presets.items()}
    assert keys["cpu"] == keys["prod"] == keys["smoke"]
    # out dirs must be distinct or a reduced run would clobber the prod artifact
    outs = [cfg["out"] for cfg in presets.values()]
    assert len(set(outs)) == len(outs)


def test_spec_presets_same_keys(spec_mod):
    presets = spec_mod.PRESETS
    assert set(presets) == {"prod", "cpu", "smoke"}
    keys = {name: set(cfg) for name, cfg in presets.items()}
    assert keys["cpu"] == keys["prod"] == keys["smoke"]
    outs = [cfg["out"] for cfg in presets.values()]
    assert len(set(outs)) == len(outs)


def test_spec_reduced_unet_kwargs_buildable(spec_mod):
    """The reduced presets' unet dicts must be accepted by create_unet and
    round-trip through the CLI's geometry inference (cli/_common.py)."""
    from diffusion_model_for_audio_defense_tpu.models.unet import (
        create_unet,
        infer_unet_kwargs,
    )

    import jax
    import jax.numpy as jnp

    for name, cfg in spec_mod.PRESETS.items():
        unet = create_unet(**cfg["unet"])
        variables = jax.eval_shape(
            lambda: unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 32, 32)), jnp.zeros((1,)))
        )
        got = infer_unet_kwargs(variables)
        for k, v in cfg["unet"].items():
            assert got[k] == v, f"{name}: {k} {got[k]} != {v}"


def test_diffwave_presets_describe_valid_wavenet(diffwave_mod):
    """dilation_cycle must divide num_res_layers (WaveNet constraint)."""
    for name, cfg in diffwave_mod.PRESETS.items():
        assert cfg["num_res_layers"] % cfg["dilation_cycle"] == 0, name
        assert cfg["dtype"] in ("bf16", "f32"), name


def test_make_eps_fn_pallas_wiring_matches_xla(diffwave_mod, rng_np):
    """The prod eval stage takes a Pallas branch the cpu/smoke presets never
    execute — run its exact wiring (make_eps_fn) in interpret mode on CPU
    and check it against WaveNet.apply, so a wiring bug can't surface hours
    into the prod TPU run."""
    import flax
    import jax
    import jax.numpy as jnp
    import numpy as np

    cfg = dict(diffwave_mod.PRESETS["prod"], res_channels=128, num_res_layers=2,
               dilation_cycle=2, dtype="f32")
    wavenet = diffwave_mod._build_wavenet(cfg)
    L = 2048
    variables = wavenet.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, L)), jnp.zeros((1, 1)))
    # zero-init output head → vacuous parity: randomize it
    variables = flax.core.unfreeze(variables)
    fc2 = variables["params"]["final_conv2"]["Conv_0"]
    variables["params"]["final_conv2"]["Conv_0"] = {
        "kernel": jnp.asarray(rng_np.standard_normal(fc2["kernel"].shape).astype(np.float32) * 0.05),
        "bias": jnp.asarray(rng_np.standard_normal(fc2["bias"].shape).astype(np.float32) * 0.05),
    }

    eps_fn = diffwave_mod.make_eps_fn(cfg, wavenet, variables, interpret=True)
    x = jnp.asarray(rng_np.standard_normal((2, 1, L)).astype(np.float32) * 0.3)
    t = jnp.full((2,), 5.0, jnp.float32)  # one_shot_denoise's call convention
    got = np.asarray(eps_fn(x, t))
    want = np.asarray(wavenet.apply(variables, x, t[:, None]))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)

    # the XLA branch (what the cpu preset runs) through the same seam
    xla_fn = diffwave_mod.make_eps_fn(dict(cfg, res_channels=32), wavenet, variables)
    np.testing.assert_allclose(np.asarray(xla_fn(x, t)), want, rtol=1e-6)
