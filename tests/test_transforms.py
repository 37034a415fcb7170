"""Defense transforms + DSP ops: parity vs scipy/torch where possible."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal as ss

from diffusion_model_for_audio_defense_tpu.ops.filters import butter_design, lfilter
from diffusion_model_for_audio_defense_tpu.ops.resample import resample
from diffusion_model_for_audio_defense_tpu.ops.kmeans import differentiable_compress, kmeans
from diffusion_model_for_audio_defense_tpu.transforms import (
    AS,
    AT,
    BPF,
    DS,
    FeCo,
    FreqDomainDefense,
    LPF,
    MS,
    TimeDomainDefense,
)


def test_lfilter_matches_scipy(rng_np):
    b, a = butter_design(0.5, 1.0, 3, 40, "low")
    x = rng_np.standard_normal((3, 400)).astype(np.float32)
    ours = np.asarray(lfilter(b, a, jnp.asarray(x)))
    theirs = ss.lfilter(b, a, x, axis=-1)
    np.testing.assert_allclose(ours, theirs, atol=1e-3, rtol=1e-3)


def test_butter_design_matches_reference_specs():
    # LPF defaults: wp=4000Hz, ws=8000Hz at fs=16k → normalized 0.5 / 1.0
    b, a = butter_design(0.5, 1.0, 3, 40, "low")
    N, Wn = ss.buttord(0.5, 1.0, 3, 40)
    b2, a2 = ss.butter(N, Wn, "low")
    np.testing.assert_allclose(b, b2)
    np.testing.assert_allclose(a, a2)


def test_resample_preserves_tone(rng_np):
    t = np.arange(16000) / 16000
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)[None, :]
    down = resample(jnp.asarray(x), 16000, 8000)
    assert down.shape[-1] == 8000
    up = np.asarray(resample(down, 8000, 16000))[:, :16000]
    # 440 Hz is far below the 4 kHz Nyquist of the downsampled signal
    err = np.mean((up[0, 200:-200] - x[0, 200:-200]) ** 2)
    assert err < 1e-3, err


def test_ds_defense_shape(rng_np):
    x = jnp.asarray(rng_np.standard_normal((2, 1, 16000)).astype(np.float32) * 0.1)
    out = DS(x, param=0.5)
    assert out.shape == x.shape
    # low-pass nature: high-frequency content reduced
    hf_in = float(jnp.mean(jnp.abs(jnp.diff(x, axis=-1))))
    hf_out = float(jnp.mean(jnp.abs(jnp.diff(out, axis=-1))))
    assert hf_out < hf_in


def test_lpf_bpf_run_and_attenuate():
    t = np.arange(4000) / 16000
    lo_tone = np.sin(2 * np.pi * 200 * t)
    hi_tone = np.sin(2 * np.pi * 7500 * t)
    x = jnp.asarray((lo_tone + hi_tone).astype(np.float32))[None, None, :]
    y = np.asarray(LPF(x))[0, 0]
    # 7.5 kHz is in the stopband (ws=8 kHz, wp=4 kHz): power should drop a lot
    hi_power_in = np.mean(hi_tone[2000:] ** 2)
    resid = y[2000:] - lo_tone[2000:]
    assert np.mean(resid**2) < 0.25 * hi_power_in
    z = np.asarray(BPF(x))
    assert z.shape == x.shape and np.isfinite(z).all()


def test_time_defenses(rng_np):
    x = jnp.asarray(rng_np.standard_normal((2, 1, 256)).astype(np.float32) * 0.1)
    at = AT(x, jax.random.PRNGKey(0), param=25.0)
    assert at.shape == x.shape and not np.allclose(np.asarray(at), np.asarray(x))
    # SNR sanity: noise power ≈ signal power / 10^2.5
    noise = np.asarray(at - x)
    snr = np.sum(np.asarray(x) ** 2) / np.sum(noise**2)
    assert 100 < snr < 1000  # 25 dB ≈ 316

    asx = AS(x, 3)
    ref = np.convolve(np.asarray(x)[0, 0], np.ones(3) / 3, mode="same")
    np.testing.assert_allclose(np.asarray(asx)[0, 0], ref, atol=1e-5)

    ms = MS(x, 3)
    med = np.asarray(ms)[0, 0]
    xp = np.pad(np.asarray(x)[0, 0], (1, 1))
    want = np.median(np.stack([xp[:-2], xp[1:-1], xp[2:]]), axis=0)
    np.testing.assert_allclose(med, want, atol=1e-6)

    d = TimeDomainDefense("MS")
    assert d._get_name() == "Median_Smoothing"
    assert d(x).shape == x.shape


def test_kmeans_compress_and_grad(rng_np):
    # two well-separated blobs → 2 clusters recover blob means
    a = rng_np.standard_normal((10, 4)) * 0.01 + 5
    b = rng_np.standard_normal((10, 4)) * 0.01 - 5
    x = jnp.asarray(np.concatenate([a, b]).astype(np.float32))
    assign, centers = kmeans(x, 2, n_iters=10)
    assert len(set(np.asarray(assign[:10]).tolist())) == 1
    assert len(set(np.asarray(assign).tolist())) == 2

    comp = differentiable_compress(x, assign, 2)
    assert comp.shape == (2, 4)
    g = jax.grad(lambda v: jnp.sum(differentiable_compress(v, assign, 2) ** 2))(x)
    assert float(jnp.abs(g).sum()) > 0


def test_feco_defense(rng_np):
    feat = jnp.asarray(rng_np.standard_normal((2, 32, 8)).astype(np.float32))
    feco = FeCo(method="kmeans", param=0.25)
    out = feco(feat)
    assert out.shape == (2, 8, 8)
    wk = FeCo(method="warped_kmeans", param=0.25, other_param="ts")
    out2 = wk(feat)
    assert out2.shape == (2, 8, 8)
    assert np.isfinite(np.asarray(out2)).all()


def test_freq_dispatcher_names():
    assert FreqDomainDefense("DS")._get_name() == "Down_Sampling"
    try:
        FreqDomainDefense("XX")
        assert False
    except NotImplementedError:
        pass
