"""Frequency-domain defenses (reference ``transforms/frequency_defense.py``).

DS: down/up resample through a sinc kernel (``:37-60``); LPF/BPF:
Butterworth designed on host, applied on device via the lax.scan lfilter
(``:62-141`` — no torch_lfilter/CPU pinning needed).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.filters import butter_design, lfilter
from ..ops.resample import resample


from ._shapes import as_bt as _as_bt


def DS(audio: jnp.ndarray, param: float = 0.5, fs: int = 16000, same_size: bool = True) -> jnp.ndarray:
    x, shape = _as_bt(audio)
    new_freq = int(fs * param)
    down = resample(x, fs, new_freq)
    up = resample(down, new_freq, fs)
    if same_size:
        up = up[..., : x.shape[-1]]
    return up.reshape(shape[:-1] + up.shape[-1:]) if not same_size else up.reshape(shape)


def _clip_bounds(x):
    scaled = jnp.logical_and(0.9 * x.max() <= 1.0, 0.9 * x.min() >= -1.0)
    hi = jnp.where(scaled, 1.0, 2.0**15 - 1)
    lo = jnp.where(scaled, -1.0, -(2.0**15))
    return lo, hi


def LPF(audio: jnp.ndarray, fs: int = 16000, wp: float = 4000, param: float = 8000, gpass: float = 3, gstop: float = 40) -> jnp.ndarray:
    x, shape = _as_bt(audio)
    b, a = butter_design(2 * wp / fs, 2 * param / fs, gpass, gstop, "low")
    lo, hi = _clip_bounds(x)
    return jnp.clip(lfilter(b, a, x), lo, hi).reshape(shape)


def BPF(audio: jnp.ndarray, fs: int = 16000, wp=(300, 4000), param=(50, 8000), gpass: float = 3, gstop: float = 40) -> jnp.ndarray:
    x, shape = _as_bt(audio)
    wp_n = tuple(2 * w / fs for w in wp)
    ws_n = tuple(2 * w / fs for w in param)
    b, a = butter_design(wp_n, ws_n, gpass, gstop, "bandpass")
    lo, hi = _clip_bounds(x)
    return jnp.clip(lfilter(b, a, x), lo, hi).reshape(shape)


class FreqDomainDefense:
    def __init__(self, defense_type: str, param=None):
        if defense_type not in ("DS", "LPF", "BPF"):
            raise NotImplementedError(f"Unknown defense type: {defense_type}!")
        self.defense_type = defense_type
        self.param = param
        self.stochastic = False

    def __call__(self, x, rng=None):
        if self.defense_type == "DS":
            return DS(x, self.param if self.param is not None else 0.5)
        if self.defense_type == "LPF":
            return LPF(x) if self.param is None else LPF(x, param=self.param)
        return BPF(x) if self.param is None else BPF(x, param=self.param)

    def _get_name(self):
        return {"DS": "Down_Sampling", "LPF": "Low_Pass_Filter", "BPF": "Band_Pass_Filter"}[self.defense_type]
