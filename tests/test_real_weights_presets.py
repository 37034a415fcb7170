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
