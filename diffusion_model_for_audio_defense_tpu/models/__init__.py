"""Model zoo + registry.

Mirrors ``audio_models/ConvNets_SpeechCommands/models/__init__.py:7-47``
(``create_model(name, num_classes, in_channels)``) plus the raw-waveform M5,
the DiffWave WaveNet ε-net, the improved-diffusion UNet and the RCNN KWS
model, all as Flax modules.
"""

from __future__ import annotations

from .wavenet import WaveNet, wavenet_from_config, diffusion_step_embedding  # noqa: F401
from .m5 import M5  # noqa: F401
from .resnext import CifarResNeXt, resnext29_8_64  # noqa: F401

_REGISTRY = {}


def register(name):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def available_models():
    return sorted(_REGISTRY)


def create_model(model_name: str, num_classes: int = 10, in_channels: int = 1):
    """ConvNets-zoo factory (reference ``models/__init__.py:17-47`` names)."""
    try:
        return _REGISTRY[model_name](num_classes=num_classes, in_channels=in_channels)
    except KeyError:
        raise ValueError(f"unknown model {model_name!r}; available: {available_models()}")


register("resnext29_8_64")(resnext29_8_64)


@register("m5")
def _m5(num_classes=10, in_channels=1):
    return M5(n_input=in_channels, n_output=num_classes, first_kernel_size=160)


def _lazy(name, module, attr):
    @register(name)
    def _f(num_classes=10, in_channels=1, _module=module, _attr=attr):
        import importlib

        m = importlib.import_module(f".{_module}", __package__)
        return getattr(m, _attr)(num_classes=num_classes, in_channels=in_channels)

    return _f


_lazy("vgg19_bn", "vgg", "vgg19_bn")
_lazy("resnet18", "resnet", "resnet18")
_lazy("resnet34", "resnet", "resnet34")
_lazy("resnet50", "resnet", "resnet50")
_lazy("resnet101", "resnet", "resnet101")
_lazy("resnet152", "resnet", "resnet152")
_lazy("wideresnet28_10", "wideresnet", "wideresnet28_10")
_lazy("wideresnet28_10D", "wideresnet", "wideresnet28_10D")
_lazy("wideresnet52_10", "wideresnet", "wideresnet52_10")
_lazy("dpn92", "dpn", "dpn92")
_lazy("densenet_bc_100_12", "densenet", "densenet_bc_100_12")
_lazy("densenet_bc_250_24", "densenet", "densenet_bc_250_24")
_lazy("densenet_bc_190_40", "densenet", "densenet_bc_190_40")
