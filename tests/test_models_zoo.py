"""Classifier zoo: shapes, registry, parameter counts vs torch golden."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_for_audio_defense_tpu.models import available_models, create_model


@pytest.mark.parametrize(
    "name",
    ["vgg19_bn", "resnet18", "resnet50", "wideresnet28_10", "densenet_bc_100_12", "dpn92", "resnext29_8_64"],
)
def test_zoo_forward_shapes(name):
    model = create_model(name, num_classes=10, in_channels=1)
    x = jnp.zeros((2, 1, 32, 32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 10)
    assert np.isfinite(np.asarray(out)).all()


def test_registry_names_cover_reference_choices():
    # reference adaptive_attack_eval.py:21 classifier choices + models/__init__.py
    for name in ["resnext29_8_64", "vgg19_bn", "densenet_bc_100_12", "wideresnet28_10", "m5"]:
        assert name in available_models()


def test_m5_shapes_and_logsoftmax():
    m5 = create_model("m5", num_classes=10)
    x = jnp.zeros((2, 1, 16000))
    variables = m5.init(jax.random.PRNGKey(0), x)
    out = m5.apply(variables, x)
    assert out.shape == (2, 10)
    # log-probabilities sum to 1 in prob space (reference M5 returns log_softmax)
    np.testing.assert_allclose(np.asarray(jnp.exp(out).sum(-1)), 1.0, rtol=1e-5)


def test_resnext_param_count_matches_torch_scale():
    # reference CifarResNeXt(8, 29, 64, 4) has ~34.4M params
    model = create_model("resnext29_8_64", num_classes=10)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 32, 32)))
    n = sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"]))
    assert 34e6 < n < 35e6, n


def test_kws_model():
    from diffusion_model_for_audio_defense_tpu.models.rcnn_kws import KWSModel

    model = KWSModel(in_size=32, num_classes=4)
    x = jnp.zeros((2, 1, 32, 48))  # (B, 1, n_mels, frames)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 4)
    np.testing.assert_allclose(np.asarray(jnp.exp(out).sum(-1)), 1.0, rtol=1e-5)
    # different sequence length also works
    out2 = model.apply(variables, jnp.zeros((2, 1, 32, 80)))
    assert out2.shape == (2, 4)


def test_bf16_variant_close_to_f32(rng_np):
    f32 = create_model("resnext29_8_64", num_classes=10)
    variables = f32.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 32, 32)))
    from diffusion_model_for_audio_defense_tpu.models.resnext import resnext29_8_64

    bf16 = resnext29_8_64(num_classes=10, dtype=jnp.bfloat16)
    x = jnp.asarray(rng_np.standard_normal((2, 1, 32, 32)).astype(np.float32))
    a = np.asarray(f32.apply(variables, x))
    b = np.asarray(bf16.apply(variables, x))
    assert np.argmax(a, -1).tolist() == np.argmax(b, -1).tolist()
    assert np.abs(a - b).max() < 0.15 * np.abs(a).max() + 0.1
