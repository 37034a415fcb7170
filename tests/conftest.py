"""Test configuration: force an 8-device CPU mesh so multi-chip sharding
semantics are exercised without a TPU pod (SURVEY.md §4 implication).

Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon sitecustomize registers the TPU plugin at interpreter start and
# pins JAX_PLATFORMS=axon; the config override below wins (must happen before
# any backend is touched)
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)


def train_wrapper(model, diffusion):
    """Train-capable duck-typed model wrapper for TrainLoop tests.

    Exposes the explicit ``train``/``rngs`` kwargs TrainLoop introspects for,
    so the suite's own call sites run warning-clean (dropout capability on);
    the deliberately train-less "legacy" wrapper in test_train.py asserts the
    warning instead.
    """

    class _W:
        def init(self, k, x, t):
            return model.init(k, x, t)

        def apply(self, p, x, t, train=False, rngs=None):
            return diffusion.wrap_model(
                lambda xx, tt: model.apply(p, xx, tt, train=train, rngs=rngs)
            )(x, t)

    return _W()
