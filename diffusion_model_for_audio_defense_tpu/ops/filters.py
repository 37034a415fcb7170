"""IIR filtering: Butterworth design (host scipy) + lfilter as a lax.scan.

Replaces the reference's ``scipy.signal.buttord/butter`` + ``torch_lfilter``
CPU path (``transforms/frequency_defense.py:62-141``). The filter design is
tiny host-side math; the recursive filter itself runs on device as a
``lax.scan`` over time with a direct-form-II-transposed state — batched over
utterances, so the TPU still vectorizes across the batch/lane dims.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal as ss


@functools.lru_cache(maxsize=16)
def butter_design(wp, ws, gpass: float = 3.0, gstop: float = 40.0, btype: str = "low"):
    """(b, a) Butterworth coefficients from band specs (normalized freqs)."""
    wp = list(wp) if isinstance(wp, tuple) else wp
    ws = list(ws) if isinstance(ws, tuple) else ws
    N, Wn = ss.buttord(wp, ws, gpass, gstop, analog=False)
    b, a = ss.butter(N, Wn, btype=btype, analog=False, output="ba")
    return np.asarray(b, np.float64), np.asarray(a, np.float64)


def lfilter(b: np.ndarray, a: np.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Causal IIR filter along the last axis of ``x (..., L)``.

    Direct-form II transposed, matching ``scipy.signal.lfilter``.
    """
    b = np.asarray(b, np.float64)
    a = np.asarray(a, np.float64)
    b = (b / a[0]).astype(np.float32)
    a = (a / a[0]).astype(np.float32)
    n = max(len(a), len(b))
    b = np.pad(b, (0, n - len(b)))
    a = np.pad(a, (0, n - len(a)))

    batch_shape = x.shape[:-1]
    xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)

    bj = jnp.asarray(b)
    aj = jnp.asarray(a)

    def step(z, x_t):
        # z: (B, n-1) filter state
        y_t = bj[0] * x_t + z[:, 0]
        z_new = jnp.concatenate([z[:, 1:], jnp.zeros_like(z[:, :1])], axis=1)
        z_new = z_new + bj[1:][None, :] * x_t[:, None] - aj[1:][None, :] * y_t[:, None]
        return z_new, y_t

    z0 = jnp.zeros((xf.shape[0], n - 1), dtype=jnp.float32)
    _, y = jax.lax.scan(step, z0, xf.T)
    return y.T.reshape(*batch_shape, x.shape[-1])
