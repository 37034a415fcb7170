"""Purifier-LOOP oracles against the ACTUAL reference torch classes.

Module-level parity (WaveNet forward) is covered in test_wavenet.py; these
tests go one level up and diff the *composed* purifier loops —
``DiffWave.forward`` (q-jump + full reverse), ``one_shot_denoise``,
``two_shot_denoise``, ``fast_reverse``, ``ReffWave.forward`` and the
unconditional ``util.sampling`` loop — against
``/root/reference/diffusion_models/diffwave_ddpm.py`` and
``DiffWave_Unconditional/util.py:126-158`` with *injected noise*: torch's
``torch.normal`` is monkeypatched to replay the exact noise sequence the JAX
implementation draws from its PRNG keys. This is the level at which the
round-1/2 in-place-residual class of bug is caught (it survived module-level
tests for a full round).
"""

import importlib
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from diffusion_model_for_audio_defense_tpu.core import linear_schedule
from diffusion_model_for_audio_defense_tpu.core.checkpoint import convert_diffwave_state_dict
from diffusion_model_for_audio_defense_tpu.models import WaveNet
from diffusion_model_for_audio_defense_tpu.purify.ddpm import (
    ddpm_purify,
    ddpm_reverse,
    fast_reverse,
    one_shot_denoise,
    q_jump,
    two_shot_denoise,
)

REFERENCE = "/root/reference"
RES, SKIP, LAYERS, CYCLE = 8, 8, 4, 2
EMB_IN, EMB_MID, EMB_OUT = 8, 16, 16
T = 20
L = 64

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "diffusion_models")),
    reason="reference repo not present",
)


def _import_reference():
    """Import the reference purifier classes with their heavyweight
    GPU/audio deps stubbed out (torchvision/torchaudio/librosa are only used
    by the dataset module this test never touches)."""
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    for name in ("torchvision", "torchaudio", "torchaudio.datasets",
                 "torchaudio.datasets.utils", "librosa"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["torchaudio.datasets.utils"].download_url = None
    sys.modules["torchaudio.datasets.utils"].extract_archive = None
    for a in ("datasets", "models", "transforms"):
        if not hasattr(sys.modules["torchvision"], a):
            setattr(sys.modules["torchvision"], a, None)
    util = importlib.import_module("diffusion_models.DiffWave_Unconditional.util")
    # WaveNet.py does a flat `from util import ...`
    sys.modules.setdefault("util", util)
    ddpm = importlib.import_module("diffusion_models.diffwave_ddpm")
    return ddpm, util


class _InjectedNoise:
    """Monkeypatches ``torch.normal`` (and neutralizes ``.cuda()``) so the
    reference draws exactly the given numpy arrays, in order."""

    def __init__(self, queue):
        self.queue = [np.asarray(q, dtype=np.float32) for q in queue]

    def __enter__(self):
        self._normal = torch.normal
        self._cuda = torch.Tensor.cuda

        def fake_normal(mean, std=1.0, size=None, **kw):
            assert self.queue, "reference drew more noise than injected"
            z = self.queue.pop(0)
            assert tuple(size) == z.shape, (tuple(size), z.shape)
            # .copy(): jax device arrays export as non-writable numpy views,
            # which torch.from_numpy warns about (and could alias)
            return torch.from_numpy(np.array(z, copy=True))

        torch.normal = fake_normal
        torch.Tensor.cuda = lambda t, *a, **k: t
        return self

    def __exit__(self, *exc):
        torch.normal = self._normal
        torch.Tensor.cuda = self._cuda
        assert not self.queue or exc[0] is not None, \
            f"{len(self.queue)} injected draws unused"


@pytest.fixture(scope="module")
def oracle():
    ddpm_mod, util_mod = _import_reference()
    torch.manual_seed(7)
    with torch.no_grad():
        net = _make_ref_wavenet(ddpm_mod)
    params = convert_diffwave_state_dict(net.state_dict(), num_res_layers=LAYERS)
    fm = WaveNet(res_channels=RES, skip_channels=SKIP, num_res_layers=LAYERS,
                 dilation_cycle=CYCLE, diffusion_step_embed_dim_in=EMB_IN,
                 diffusion_step_embed_dim_mid=EMB_MID, diffusion_step_embed_dim_out=EMB_OUT)
    eps_fn = lambda x, t: fm.apply({"params": params}, x, t[:, None])
    hp = util_mod.calc_diffusion_hyperparams(T, 1e-4, 0.02)
    sched = linear_schedule(T)
    return ddpm_mod, util_mod, net, eps_fn, hp, sched


def _make_ref_wavenet(ddpm_mod):
    net = ddpm_mod.WaveNet_Speech_Commands(
        in_channels=1, res_channels=RES, skip_channels=SKIP, out_channels=1,
        num_res_layers=LAYERS, dilation_cycle=CYCLE,
        diffusion_step_embed_dim_in=EMB_IN, diffusion_step_embed_dim_mid=EMB_MID,
        diffusion_step_embed_dim_out=EMB_OUT).eval()
    # the zero-init output head would make every parity check vacuous
    net.final_conv[2].conv.weight.data.normal_()
    net.final_conv[2].conv.bias.data.normal_()
    return net


def _x0(rng_np, bsz=2):
    return rng_np.standard_normal((bsz, 1, L)).astype(np.float32) * 0.3


def _jax_noise(key, shape):
    return np.asarray(jax.random.normal(key, shape, dtype=jnp.float32))


def test_ddpm_purify_loop_oracle(oracle, rng_np):
    ddpm_mod, _, net, eps_fn, hp, sched = oracle
    t_star = 6
    x0 = _x0(rng_np)
    rng = jax.random.PRNGKey(0)

    ours = np.asarray(ddpm_purify(eps_fn, sched, jnp.asarray(x0), t_star, rng))

    # replay our PRNG draw sequence into torch: q-jump z, then one z per
    # reverse step t = t*-1 … 1 (the reference draws none at t=0)
    k1, k2 = jax.random.split(rng)
    keys = jax.random.split(k2, t_star)
    queue = [_jax_noise(k1, x0.shape)] + [_jax_noise(keys[i], x0.shape) for i in range(t_star - 1)]
    ref = ddpm_mod.DiffWave(net, hp, reverse_timestep=t_star)
    with _InjectedNoise(queue), torch.no_grad():
        golden = ref(torch.from_numpy(x0)).numpy()
    np.testing.assert_allclose(ours, golden, atol=5e-4, rtol=1e-3)


def test_one_and_two_shot_denoise_oracle(oracle, rng_np):
    ddpm_mod, _, net, eps_fn, hp, sched = oracle
    t_star = 6
    x_t = _x0(rng_np)
    ref = ddpm_mod.DiffWave(net, hp, reverse_timestep=t_star)
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda t, *a, **k: t
    try:
        with torch.no_grad():
            g1 = ref.one_shot_denoise(torch.from_numpy(x_t)).numpy()
            g2 = ref.two_shot_denoise(torch.from_numpy(x_t)).numpy()
    finally:
        torch.Tensor.cuda = orig_cuda
    o1 = np.asarray(one_shot_denoise(eps_fn, sched, jnp.asarray(x_t), t_star))
    o2 = np.asarray(two_shot_denoise(eps_fn, sched, jnp.asarray(x_t), t_star))
    np.testing.assert_allclose(o1, g1, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(o2, g2, atol=2e-4, rtol=1e-3)


def test_fast_reverse_oracle(oracle, rng_np):
    ddpm_mod, _, net, eps_fn, hp, sched = oracle
    t_star, K = 9, 3
    x_t = _x0(rng_np)
    rng = jax.random.PRNGKey(3)
    ours = np.asarray(fast_reverse(eps_fn, sched, jnp.asarray(x_t), t_star, rng, K=K))

    keys = jax.random.split(rng, K)
    queue = [_jax_noise(keys[t], x_t.shape) for t in range(K - 1, -1, -1)]
    ref = ddpm_mod.DiffWave(net, hp, reverse_timestep=t_star)
    with _InjectedNoise(queue), torch.no_grad():
        golden = ref.fast_reverse(torch.from_numpy(x_t)).numpy()
    np.testing.assert_allclose(ours, golden, atol=5e-4, rtol=1e-3)


def test_reffwave_oracle(oracle, rng_np):
    ddpm_mod, _, net, eps_fn, hp, sched = oracle
    from diffusion_model_for_audio_defense_tpu.purify.ddpm import ReDiffWavePurifier

    t_star, num_re = 5, 3
    x0 = _x0(rng_np)
    rng = jax.random.PRNGKey(5)
    purifier = ReDiffWavePurifier.__new__(ReDiffWavePurifier)
    # build via from_eps_fn-equivalent wiring
    purifier.apply_fn = None
    purifier.params = None
    purifier.schedule = sched
    purifier.reverse_timestep = t_star
    purifier.remat = True
    purifier._eps_fn = eps_fn
    purifier.num_re = num_re
    ours = np.asarray(purifier(jnp.asarray(x0), rng))

    keys = jax.random.split(rng, num_re)
    queue = [_jax_noise(k, x0.shape) for k in keys]
    ref = ddpm_mod.ReffWave(net, hp, reverse_timestep=t_star, num_re=num_re)
    with _InjectedNoise(queue), torch.no_grad():
        golden = ref(torch.from_numpy(x0)).numpy()
    np.testing.assert_allclose(ours, golden, atol=5e-4, rtol=1e-3)


def test_unconditional_sampling_oracle(oracle):
    """The full T-step reverse from pure noise (util.py:126-158) — the loop
    behind cli/inference.py."""
    _, util_mod, net, eps_fn, hp, sched = oracle
    bsz = 2
    rng = jax.random.PRNGKey(11)
    k0, k1 = jax.random.split(rng)
    x_T = _jax_noise(k0, (bsz, 1, L))
    ours = np.asarray(ddpm_reverse(eps_fn, sched, jnp.asarray(x_T), T, k1))

    keys = jax.random.split(k1, T)
    queue = [x_T] + [_jax_noise(keys[i], x_T.shape) for i in range(T - 1)]
    with _InjectedNoise(queue), torch.no_grad():
        golden = util_mod.sampling(net, (bsz, 1, L), hp).numpy()
    np.testing.assert_allclose(ours, golden, atol=1e-3, rtol=1e-3)


def test_q_jump_matches_reference_diffusion(oracle, rng_np):
    ddpm_mod, _, net, eps_fn, hp, sched = oracle
    t_star = 6
    x0 = _x0(rng_np)
    key = jax.random.PRNGKey(21)
    ours = np.asarray(q_jump(sched, jnp.asarray(x0), t_star, key))
    ref = ddpm_mod.DiffWave(net, hp, reverse_timestep=t_star)
    with _InjectedNoise([_jax_noise(key, x0.shape)]), torch.no_grad():
        golden = ref._diffusion(torch.from_numpy(x0)).numpy()
    np.testing.assert_allclose(ours, golden, atol=1e-5, rtol=1e-5)


def test_vpsde_loop_oracle(oracle, rng_np):
    """VP-SDE purifier vs the reference ``RevVPSDE`` drift/diffusion (the
    one purifier family torchsde's absence otherwise leaves un-oracled):
    torchsde's Euler scheme is replicated exactly (x += f·h + g·√h·z over
    the dt=1/N grid with a partial last step, ``diffwave_sde.py:193-204``)
    but driven by the reference class's own ``f``/``g`` with injected noise.
    Grid times are carried in exact f64 so the s·N timestep index is the
    exact-math integer both sides agree on (our scan uses round() for the
    same reason)."""
    ddpm_mod, _, net, eps_fn, hp, sched = oracle
    import types

    if "torchsde" not in sys.modules:  # imported at diffwave_sde.py top; unused here
        sys.modules["torchsde"] = types.ModuleType("torchsde")
    sde_mod = importlib.import_module("diffusion_models.diffwave_sde")

    from diffusion_model_for_audio_defense_tpu.purify.sde import _sde_grid, vpsde_purify

    t_star = 6
    x0 = _x0(rng_np)
    rng = jax.random.PRNGKey(31)
    ours = np.asarray(vpsde_purify(eps_fn, sched, jnp.asarray(x0), t_star, rng))

    # replay our PRNG draws: q-jump e, then one z per Euler step
    key = jax.random.split(rng, 1)[0]
    k1, k2 = jax.random.split(key)
    e = _jax_noise(k1, x0.shape)
    taus, hs = _sde_grid(t_star, T)
    keys = jax.random.split(k2, len(taus))
    zs = [_jax_noise(k, x0.shape) for k in keys]

    ref_dw = ddpm_mod.DiffWave(net, hp, reverse_timestep=t_star)
    rev = sde_mod.RevVPSDE(model=ref_dw, score_type="guided_diffusion",
                           beta_min=1e-4 * T, beta_max=0.02 * T, N=T,
                           audio_shape=(1, L))
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda t, *a, **k: t
    try:
        with torch.no_grad():
            a = (1 - rev.discrete_betas).cumprod(dim=0)
            x = (torch.from_numpy(x0) * a[t_star - 1].sqrt()
                 + torch.from_numpy(e) * (1.0 - a[t_star - 1]).sqrt())
            bsz = x0.shape[0]
            x_ = x.view(bsz, -1)
            for tau, h, z in zip(taus, hs, zs):
                # f64 time keeps the s·N timestep index exact; state stays f32
                tt = torch.full((1,), float(tau), dtype=torch.float64)
                f = rev.f(tt, x_)
                g = rev.g(tt, x_)
                x_ = (x_ + f * h + g * float(np.sqrt(h))
                      * torch.from_numpy(z.copy()).view(bsz, -1)).to(torch.float32)
            golden = x_.view(*x0.shape).numpy()
    finally:
        torch.Tensor.cuda = orig_cuda
    np.testing.assert_allclose(ours, golden, atol=1e-3, rtol=1e-3)


def test_spec_vpsde_loop_oracle(rng_np):
    """Spec-domain VP-SDE solver vs the reference image ``RevVPSDE``
    (``improved_diffusion_sde.py:48-137``): continuous-ᾱ score, linear
    β(s) = β₀ + s(β₁−β₀), g = √β — different math from the waveform variant
    (no discrete scale factor). torchsde's Euler (dt=1e-3) is replicated
    manually with injected noise; the ε-net is a tiny closed-form model
    mirrored exactly on both sides (the real UNet's converter parity is
    covered by test_unet_converter)."""
    import types

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    for name in ("torchvision", "torchvision.utils", "torchvision.transforms",
                 "torchaudio", "torchaudio.datasets", "torchaudio.datasets.utils",
                 "torchaudio.transforms", "librosa", "torchsde", "mpi4py", "blobfile"):
        mod = types.ModuleType(name)
        mod.__all__ = []
        sys.modules.setdefault(name, mod)
    tv = sys.modules["torchvision"]
    tv.__path__ = getattr(tv, "__path__", [])
    tv.utils = sys.modules["torchvision.utils"]
    tv.transforms = sys.modules["torchvision.transforms"]
    ta = sys.modules["torchaudio"]
    ta.__path__ = getattr(ta, "__path__", [])
    ta.transforms = sys.modules["torchaudio.transforms"]
    ta.datasets = sys.modules["torchaudio.datasets"]
    for name in ("torchvision.transforms", "torchaudio.transforms"):
        sys.modules[name].__all__ = []
    sde_mod = importlib.import_module("diffusion_models.improved_diffusion_sde")

    from diffusion_model_for_audio_defense_tpu.purify.spec import spec_vpsde_reverse

    N, beta_min, beta_max = 1000, 0.1, 20.0
    H = 8
    w = rng_np.standard_normal((1, 1, 1, 1)).astype(np.float32) * 0.5
    b = np.float32(0.1)

    def eps_jax(x, t):  # t: (B,) float timestep index
        return jnp.tanh(x) * w[0, 0, 0, 0] + b + 1e-3 * t[:, None, None, None]

    class TorchEps(torch.nn.Module):
        def forward(self, x, disc_steps):
            return (torch.tanh(x) * float(w[0, 0, 0, 0]) + float(b)
                    + 1e-3 * disc_steps.float()[:, None, None, None])

    t_star = 5
    x_t = jnp.asarray(rng_np.standard_normal((2, 1, H, H)).astype(np.float32) * 0.3)
    rng = jax.random.PRNGKey(41)
    ours = np.asarray(spec_vpsde_reverse(eps_jax, x_t, t_star, rng, N, beta_min, beta_max))

    # replay the scan's grid + noise into a manual torchsde-Euler over the
    # reference f/g (dt = 1e-3, partial last step to t1 = 1 - 1e-5)
    t0 = 1.0 - t_star / N
    grid = np.arange(t0, 1.0 - 1e-5, 1e-3)
    grid = np.concatenate([grid, [1.0 - 1e-5]])
    taus, hs = grid[:-1], np.diff(grid)
    keys = jax.random.split(rng, len(taus))
    zs = [_jax_noise(k, x_t.shape) for k in keys]

    rev = sde_mod.RevVPSDE(model=TorchEps(), score_type="guided_diffusion",
                           beta_min=beta_min, beta_max=beta_max, N=N,
                           img_shape=(1, H, H))
    with torch.no_grad():
        bsz = x_t.shape[0]
        x_ = torch.from_numpy(np.asarray(x_t)).view(bsz, -1)
        for tau, h, z in zip(taus, hs, zs):
            tt = torch.full((1,), float(tau), dtype=torch.float64)
            f = rev.f(tt, x_)
            g = rev.g(tt, x_)
            x_ = (x_ + f * h + g * float(np.sqrt(h))
                  * torch.from_numpy(z.copy()).view(bsz, -1)).to(torch.float32)
        golden = x_.view(*x_t.shape).numpy()
    np.testing.assert_allclose(ours, golden, atol=1e-3, rtol=1e-3)


def test_ssa_oracle_vs_reference(rng_np):
    """ops/ssa vs the actual reference ``_ssa_core.{ssa,inv_ssa}`` (torch
    SVD + nn.Fold reconstruction). Reconstructions from the same component
    set must agree regardless of SVD sign conventions."""
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    ref = importlib.import_module("robustness_eval._ssa_core")

    from diffusion_model_for_audio_defense_tpu.ops.ssa import inv_ssa, ssa

    y = rng_np.standard_normal(200).astype(np.float64)
    dim = 30
    pc, s, v = ssa(y, dim)
    pc_r, s_r, v_r = ref.ssa(torch.from_numpy(y), dim)
    np.testing.assert_allclose(s, np.asarray(s_r), rtol=1e-8)
    for k in ([0], [0, 1, 2], list(range(10))):
        ours = inv_ssa(pc, v, k)
        theirs = ref.inv_ssa(pc_r, v_r, k)
        np.testing.assert_allclose(ours, np.asarray(theirs).ravel(), atol=1e-8,
                                   err_msg=f"components {k}")
    # full reconstruction is the identity on both sides
    np.testing.assert_allclose(inv_ssa(pc, v, list(range(dim))), y, atol=1e-8)


def test_kenansville_fft_compression_oracle(rng_np):
    """attacks.kenansville.fft_compression vs the reference batched variant
    (``_KenanFFT.py:57-82``: zero rFFT bins with |F| < factor, irfft)."""
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    kfft = importlib.import_module("robustness_eval._KenanFFT")

    from diffusion_model_for_audio_defense_tpu.attacks.kenansville import fft_compression

    x = rng_np.standard_normal((3, 1, 256)).astype(np.float32) * 0.3
    factors = np.asarray([0.5, 2.0, 10.0], dtype=np.float32)
    ours = np.asarray(fft_compression(jnp.asarray(x), jnp.asarray(factors)))
    theirs = kfft.fft_compression(torch.from_numpy(x.copy()),
                                  torch.from_numpy(factors.copy()), fs=16000).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-4)


def test_margin_loss_and_decision_oracle(rng_np):
    """attacks.losses margin/decision vs the reference ``_utils.py``
    SEC4SR_MarginLoss + resolve_prediction, across CSI/SV/OSI tasks and
    targeted/untargeted."""
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    ru = importlib.import_module("robustness_eval._utils")

    from diffusion_model_for_audio_defense_tpu.attacks.losses import (
        make_decision,
        margin_loss,
        resolve_prediction,
    )

    scores = rng_np.standard_normal((6, 4)).astype(np.float32)
    y = rng_np.integers(0, 4, 6)
    y[4:] = -1  # include rejected/imposter rows in every task
    for task in ("CSI", "SV", "OSI"):
        if task == "SV":
            s = scores[:, :1]
            yy = np.zeros(6, dtype=np.int64)
            yy[4:] = -1
        else:
            s, yy = scores, y
        for targeted in (False, True):
            ref_loss = ru.SEC4SR_MarginLoss(targeted=targeted, confidence=0.5,
                                            task=task, threshold=0.1, clip_max=False)
            want = ref_loss(torch.from_numpy(s.copy()), torch.from_numpy(yy.copy())).numpy()
            got = np.asarray(margin_loss(jnp.asarray(s), jnp.asarray(yy), targeted,
                                         0.5, task, threshold=0.1, clip_max=False))
            np.testing.assert_allclose(got, want, atol=1e-6,
                                       err_msg=f"{task} targeted={targeted}")
        # (the reference _utils.py has no make_decision — the SV/OSI decision
        # protocol exists only as the commented model.make_decision calls in
        # black_box_attack.py:225,260; ours is behavior-tested in
        # test_attacks.test_margin_loss_sv_osi_formulas)

    # resolve_prediction majority vote vs the reference (ours takes
    # (draws, audios); the reference iterates per-audio rows, so transpose)
    dec = rng_np.integers(0, 4, (5, 6))
    want = ru.resolve_prediction(dec.T.copy())
    got = resolve_prediction(dec)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_eot_oracle_vs_reference(rng_np):
    """EOT wrapper vs the reference ``_EOT.py``: same repeat layout
    (batch-major tiling), replica-averaged scores/loss/input-grad, per-draw
    decisions. Deterministic linear model mirrored on both sides so draws
    are exactly comparable; chunking 4 = 2×2 exercises the multi-batch
    accumulation path."""
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    reot = importlib.import_module("robustness_eval._EOT")

    from diffusion_model_for_audio_defense_tpu.attacks import EOT, cross_entropy

    B, Lw, C = 3, 32, 4
    W = rng_np.standard_normal((Lw, C)).astype(np.float32) * 0.5
    x = rng_np.standard_normal((B, 1, Lw)).astype(np.float32)
    y = rng_np.integers(0, C, B)

    jax_model = lambda xx, rng: xx[:, 0, :] @ jnp.asarray(W)
    eot = EOT(jax_model, cross_entropy, eot_size=4, eot_batch_size=2)
    scores, loss, grad, decisions = eot(jnp.asarray(x), jnp.asarray(y),
                                        jax.random.PRNGKey(0), use_grad=True)

    t_model = lambda xx: xx[:, 0, :] @ torch.from_numpy(W.copy())
    t_loss = torch.nn.CrossEntropyLoss(reduction="none")
    ref = reot.EOT(t_model, t_loss, EOT_size=4, EOT_batch_size=2, use_grad=True)
    xt = torch.from_numpy(x.copy()).requires_grad_(True)
    w_scores, w_loss, w_grad, w_dec = ref(xt, torch.from_numpy(y.copy()))

    np.testing.assert_allclose(np.asarray(scores), w_scores.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(loss), w_loss.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(grad), w_grad.detach().numpy(), atol=1e-5)
    # decisions: ours (draws, audios); reference list-per-audio
    np.testing.assert_array_equal(np.asarray(decisions).T, np.asarray(w_dec))


def test_nes_oracle_vs_reference(rng_np):
    """NES estimator vs the reference ``_NES.py`` (antithetic pairs, clean
    point prepended, grad = E[loss·noise]/σ) with ``torch.randn``
    monkeypatched to our exact noise draw. Single chunk + EOT_size=1 so the
    reference's double-division quirk (loss.data /= EOT_num_batches on
    already-averaged losses) divides by 1 and both sides agree."""
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    rnes = importlib.import_module("robustness_eval._NES")
    reot = importlib.import_module("robustness_eval._EOT")

    from diffusion_model_for_audio_defense_tpu.attacks import cross_entropy
    from diffusion_model_for_audio_defense_tpu.attacks.nes import nes_grad

    B, Lw, C, S = 2, 32, 4, 6
    sigma = 0.01
    W = rng_np.standard_normal((Lw, C)).astype(np.float32) * 0.5
    x = rng_np.standard_normal((B, 1, Lw)).astype(np.float32)
    y = rng_np.integers(0, C, B)

    jax_model = lambda xx, rng: xx[:, 0, :] @ jnp.asarray(W)
    est = nes_grad(jax_model, cross_entropy, samples_per_draw=S, sigma=sigma)
    rng = jax.random.PRNGKey(3)
    mean_loss, grad, adv_loss, adv_score, predict = est(jnp.asarray(x), jnp.asarray(y), rng)

    # our draw: normal(k_noise, (B, S//2, 1, L))
    k_noise, _ = jax.random.split(rng)
    z = np.asarray(jax.random.normal(k_noise, (B, S // 2, 1, Lw), dtype=jnp.float32))

    t_model = lambda xx: xx[:, 0, :] @ torch.from_numpy(W.copy())
    t_loss = torch.nn.CrossEntropyLoss(reduction="none")
    eot = reot.EOT(t_model, t_loss, EOT_size=1, EOT_batch_size=1, use_grad=False)
    ref = rnes.NES(samples_per_draw=S, samples_per_draw_batch=S, sigma=sigma, EOT_wrapper=eot)
    orig_randn = torch.randn
    torch.randn = lambda *shape, **kw: torch.from_numpy(z.copy())
    try:
        with torch.no_grad():
            w_ml, w_g, w_al, w_as, w_p = ref(torch.from_numpy(x.copy()), torch.from_numpy(y.copy()))
    finally:
        torch.randn = orig_randn
    np.testing.assert_allclose(np.asarray(mean_loss), w_ml.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(grad), w_g.numpy(), atol=1e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(adv_loss), w_al.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(adv_score), w_as.numpy(), atol=1e-5)
    np.testing.assert_array_equal(predict, np.asarray(w_p))
