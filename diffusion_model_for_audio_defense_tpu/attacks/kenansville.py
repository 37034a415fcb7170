"""Kenansville signal-processing attack.

Rebuild of ``robustness_eval/black_box_attack.py:584-661`` + ``_KenanFFT.py``
+ ``_Kenan.py``: remove perceptually-irrelevant signal content until the
model mistranscribes, binary-searching the attack factor.

- ``fft`` variant (batched): zero rFFT bins with magnitude below the factor;
  per-sample binary search between 0 and max|FFT| (``_KenanFFT.py:180-246``).
  Fully on-device: one jitted compress+classify per iteration — or, with
  ``fused_loop=True``, the WHOLE binary search as one ``lax.fori_loop`` with
  on-device lo/hi/best bookkeeping (exact host key-schedule parity; saves
  the ~max_iter host round-trips like the fused FAKEBOB/SirenAttack loops).
- ``ssa`` variant (batch 1): SVD of the Hankel trajectory matrix (host
  numpy, computed once and recycled), keep the top-k components, binary
  search over the kept-percentage with the reference's integer-factor
  convergence early-exit. Stays host-side: the SVD has no TPU placement
  and the early-exit is data-dependent on an integer host value.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.functional import jit_hoisted

from ..ops.ssa import inv_ssa, ssa


def fft_compression(audio: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    """Zero rFFT bins under |factor| (reference ``fft_compression``)."""
    f = jnp.fft.rfft(audio, axis=2)
    f = jnp.where(jnp.abs(f) < factor[:, None, None], 0.0, f)
    return jnp.fft.irfft(f, n=audio.shape[2], axis=2)


class Kenansville:
    def __init__(
        self,
        model_fn,
        atk_name: str = "fft",
        max_iter: int = 15,
        raster_width: int = 100,
        early_stop: bool = False,
        targeted: bool = False,
        batch_size: int = 1,
        bits: int = 16,
        verbose: int = 1,
        fused_loop: bool = False,
    ):
        self.model_fn = model_fn
        self.atk_name = atk_name
        self.max_iter = max_iter
        self.raster_width = raster_width
        self.early_stop = early_stop
        self.targeted = targeted
        self.bits = bits
        self.verbose = verbose
        self.fused_loop = fused_loop
        self.batch_size = 1 if atk_name == "ssa" else batch_size

        def _compress_predict(x, factor, rng):
            adv = fft_compression(x, factor)
            scores = self.model_fn(adv, rng)
            return adv, jnp.argmax(scores, axis=-1)

        self._fft_step = jit_hoisted(_compress_predict)
        self._predict = jit_hoisted(lambda x, rng: jnp.argmax(self.model_fn(x, rng), axis=-1))
        self._fused_fft = None  # built lazily (jit per targeted flag)

    def generate(self, x, y, targeted: bool = False, rng=None, fs: int = 16_000):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.targeted = targeted
        x = jnp.asarray(x)
        y_np = np.asarray(y)

        outs, succs = [], []
        bs = min(self.batch_size, x.shape[0])
        for b0 in range(0, x.shape[0], bs):
            rng, kb = jax.random.split(rng)
            xb, yb = x[b0 : b0 + bs], y_np[b0 : b0 + bs]
            if self.atk_name == "fft":
                if self.fused_loop:
                    adv, suc = self._attack_fft_fused(xb, jnp.asarray(y)[b0 : b0 + bs], kb)
                else:
                    adv, suc = self._attack_fft(xb, yb, kb)
            elif self.atk_name == "ssa":
                adv, suc = self._attack_ssa(xb, yb, kb)
            else:
                raise NotImplementedError(self.atk_name)
            outs.append(np.asarray(adv))
            succs += suc
        return np.concatenate(outs, axis=0), succs

    def _attack_fft(self, x, y_np, rng):
        bsz = x.shape[0]
        adv_best = np.asarray(x).copy()
        lo = np.zeros(bsz)
        hi = np.asarray(jnp.max(jnp.abs(jnp.fft.fft(x, axis=2)), axis=2)).reshape(bsz).copy()
        factor = hi / 2.0
        success = [False] * bsz

        for it in range(self.max_iter):
            rng, k = jax.random.split(rng)
            adv, pred = self._fft_step(x, jnp.asarray(factor, x.dtype), k)
            pred = np.asarray(pred)
            if self.verbose:
                print(f"Iter: {it + 1} ori: {y_np} atk: {pred} f: {factor}")
            adv_np = None
            for p in range(bsz):
                hit = (y_np[p] != pred[p]) if not self.targeted else (y_np[p] == pred[p])
                if hit:
                    if adv_np is None:
                        adv_np = np.asarray(adv)
                    adv_best[p] = adv_np[p]
                    hi[p] = factor[p]
                    success[p] = True
                else:
                    lo[p] = factor[p]
                factor[p] = abs(lo[p] + hi[p]) / 2.0
        return adv_best, success

    def _attack_fft_fused(self, x, y, rng):
        """Whole fft binary search as one ``lax.fori_loop`` (device-resident).

        Same math and key schedule as ``_attack_fft``: per-iteration
        ``rng, k = split(rng)``, hit ⇒ record adv + shrink ``hi``, miss ⇒
        raise ``lo``, next ``factor = |lo+hi|/2`` — so fixed seeds reproduce
        the host loop bitwise-close (f32 on-device bookkeeping vs the host's
        f64 midpoints is the only divergence source, as in stage 1/2).
        """
        targeted = self.targeted
        if self._fused_fft is None or self._fused_fft[0] != targeted:

            def run(x, y, rng):
                hi0 = jnp.max(jnp.abs(jnp.fft.fft(x, axis=2)), axis=2).reshape(x.shape[0])
                hi0 = hi0.astype(x.dtype)

                def body(_, s):
                    key, k = jax.random.split(s["rng"])
                    adv = fft_compression(x, s["factor"])
                    pred = jnp.argmax(self.model_fn(adv, k), axis=-1)
                    hit = (y == pred) if targeted else (y != pred)
                    adv_best = jnp.where(hit[:, None, None], adv, s["adv_best"])
                    hi = jnp.where(hit, s["factor"], s["hi"])
                    lo = jnp.where(hit, s["lo"], s["factor"])
                    return dict(rng=key, lo=lo, hi=hi,
                                factor=jnp.abs(lo + hi) / 2.0,
                                adv_best=adv_best, success=s["success"] | hit)

                s0 = dict(rng=rng, lo=jnp.zeros_like(hi0), hi=hi0, factor=hi0 / 2.0,
                          adv_best=x, success=jnp.zeros(x.shape[0], bool))
                out = jax.lax.fori_loop(0, self.max_iter, body, s0)
                return out["adv_best"], out["success"]

            self._fused_fft = (targeted, jit_hoisted(run))
        adv_best, success = self._fused_fft[1](x, y, rng)
        return adv_best, [bool(s) for s in np.asarray(success)]

    def _attack_ssa(self, x, y_np, rng):
        assert x.shape[0] == 1, "ssa variant attacks one utterance at a time"
        data = np.asarray(x).ravel()
        # reference int16-quantizes the waveform before SSA (black_box_attack.py:607-610)
        scale = 2.0 ** (self.bits - 1)
        data_i16 = (data * scale).astype(np.int16).astype(np.float64)
        window = min(int(len(data_i16) * 0.05), 3000)
        pc, _, v = ssa(data_i16, window)  # computed once, recycled through the search

        lo, hi = 0.0, float(self.raster_width)
        val = hi / 2.0
        success = False
        adv_best = np.asarray(x).copy()
        prev_factor = -1

        for it in range(self.max_iter):
            rng, k = jax.random.split(rng)
            n_comp = max(1, int(window * val / 100.0))
            if n_comp == prev_factor:  # integer factor converged (reference bst early-exit)
                break
            prev_factor = n_comp
            rec = inv_ssa(pc, v, np.arange(n_comp)).astype(np.int16).astype(np.float32) / scale
            adv = jnp.asarray(rec).reshape(1, 1, -1)
            pred = int(np.asarray(self._predict(adv, k))[0])
            hit = (pred != y_np[0]) if not self.targeted else (pred == y_np[0])
            if self.verbose:
                print(f"Iter: {it + 1} ori: {y_np[0]} atk: {pred} keep: {n_comp}/{window}")
            if hit:
                adv_best = np.asarray(adv)
                lo = val  # success: keep more components (less distortion)
                success = True
            else:
                hi = val
            val = abs(lo + hi) / 2.0
        return adv_best, [success]
