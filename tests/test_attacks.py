"""Attack-layer tests on a tiny differentiable toy system."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from diffusion_model_for_audio_defense_tpu.attacks import (
    EOT,
    AudioAttack,
    FAKEBOB,
    Kenansville,
    PsychoacousticMasker,
    SirenAttack,
    bpda,
    cross_entropy,
    lp_norm,
    margin_loss,
    nes_grad,
    project_to_norm_ball,
    resolve_prediction,
)

L = 128
NCLS = 4


def toy_model(x, rng=None):
    """Linear 4-class head on fixed random projections of the waveform."""
    w = jax.random.normal(jax.random.PRNGKey(42), (L, NCLS)) * 0.5
    return x[:, 0, :] @ w


def noisy_model(x, rng):
    z = jax.random.normal(rng, x.shape) * 0.01
    return toy_model(x + z)


def test_cross_entropy_matches_torch(rng_np):
    s = rng_np.standard_normal((5, NCLS)).astype(np.float32)
    y = rng_np.integers(0, NCLS, 5)
    ours = np.asarray(cross_entropy(jnp.asarray(s), jnp.asarray(y)))
    theirs = torch.nn.functional.cross_entropy(torch.from_numpy(s), torch.from_numpy(y), reduction="none").numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_margin_loss_sign_semantics():
    s = jnp.asarray([[5.0, 0.0, 0.0, 0.0], [0.0, 5.0, 0.0, 0.0]])
    y = jnp.asarray([0, 0])
    l = margin_loss(s, y, targeted=False, clip_max=False)
    assert float(l[0]) > 0  # correctly classified → positive margin
    assert float(l[1]) < 0  # already misclassified → negative (= success)


def test_projection_ops(rng_np):
    x = jnp.asarray(rng_np.standard_normal((3, 1, 16)).astype(np.float32)) * 10
    xi = project_to_norm_ball(x, "linf", 0.5)
    assert float(jnp.abs(xi).max()) <= 0.5 + 1e-6
    x2 = project_to_norm_ball(x, "l2", 1.0)
    assert float(jnp.sqrt(jnp.sum(x2**2, axis=(1, 2))).max()) <= 1.0 + 1e-5
    # per-sample radii
    xp = project_to_norm_ball(x, "linf", jnp.asarray([0.1, 0.2, 0.3]))
    maxes = np.asarray(jnp.abs(xp).max(axis=(1, 2)))
    assert np.all(maxes <= np.array([0.1, 0.2, 0.3]) + 1e-6)
    assert float(lp_norm(xi, "linf")) <= 0.5 + 1e-6


def test_resolve_prediction_majority():
    dec = np.array([[0, 1], [0, 2], [1, 2], [0, 2]])  # (draws, audios)
    np.testing.assert_array_equal(resolve_prediction(dec), [0, 2])


def test_eot_averages_and_decisions(rng_np):
    x = jnp.asarray(rng_np.standard_normal((2, 1, L)).astype(np.float32)) * 0.1
    y = jnp.asarray([0, 1])
    eot = EOT(noisy_model, cross_entropy, eot_size=8)
    scores, loss, grad, decisions = eot(x, y, jax.random.PRNGKey(0))
    assert scores.shape == (2, NCLS) and loss.shape == (2,)
    assert grad.shape == x.shape and decisions.shape == (8, 2)
    # deterministic model → EOT equals plain forward
    eot_det = EOT(lambda xx, k: toy_model(xx), cross_entropy, eot_size=4)
    s2, _, _, _ = eot_det(x, y, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(s2), np.asarray(toy_model(x)), atol=1e-5)


def test_pgd_attack_flips_labels(rng_np):
    x = jnp.asarray(rng_np.standard_normal((4, 1, L)).astype(np.float32) * 0.05)
    y = np.asarray(jnp.argmax(toy_model(x), axis=-1))
    atk = AudioAttack(
        lambda xx, rng: toy_model(xx),
        eps=2000.0,
        norm="linf",
        max_iter_1=30,
        max_iter_2=0,
        learning_rate_1=400.0,
        verbose=0,
    )
    x_adv, (succ, _) = atk.generate(x, jnp.asarray(y), targeted=False, rng=jax.random.PRNGKey(0))
    assert all(succ), "untargeted PGD should fool a linear model"
    pred_adv = np.asarray(jnp.argmax(toy_model(x_adv), axis=-1))
    assert (pred_adv != y).all()
    # perturbation stays in the (shrinking) linf ball and valid range
    assert float(jnp.abs(x_adv - x).max()) <= 2000.0 * 2**-15 + 1e-6
    assert float(jnp.abs(x_adv).max()) <= 1.0 + 1e-6


def test_pgd_with_eot(rng_np):
    x = jnp.asarray(rng_np.standard_normal((2, 1, L)).astype(np.float32) * 0.05)
    y = np.asarray(jnp.argmax(toy_model(x), axis=-1))
    atk = AudioAttack(
        noisy_model, eps=2000.0, max_iter_1=20, max_iter_2=0, learning_rate_1=400.0,
        eot_attack_size=4, eot_defense_size=4, verbose=0,
    )
    x_adv, (succ, _) = atk.generate(x, jnp.asarray(y), targeted=False, rng=jax.random.PRNGKey(1))
    assert x_adv.shape == x.shape and all(succ)


def test_nes_grad_approximates_true_grad(rng_np):
    x = jnp.asarray(rng_np.standard_normal((2, 1, L)).astype(np.float32) * 0.1)
    y = jnp.asarray([0, 1])
    est = nes_grad(lambda xx, k: toy_model(xx), cross_entropy, samples_per_draw=512, sigma=0.001)
    _, g_est, _, _, _ = est(x, y, jax.random.PRNGKey(0))
    g_true = jax.grad(lambda xx: cross_entropy(toy_model(xx), y).sum())(x)
    cos = np.sum(np.asarray(g_est) * np.asarray(g_true)) / (
        np.linalg.norm(np.asarray(g_est)) * np.linalg.norm(np.asarray(g_true))
    )
    assert cos > 0.7, f"NES grad poorly aligned: cos={cos}"


def test_fakebob_attacks_toy(rng_np):
    x = jnp.asarray(rng_np.standard_normal((2, 1, L)).astype(np.float32) * 0.02)
    y = np.asarray(jnp.argmax(toy_model(x), axis=-1))
    atk = FAKEBOB(
        lambda xx, k: toy_model(xx), task="SCR", epsilon=0.01, max_iter=30,
        max_lr=2e-3, samples_per_draw=64, samples_per_draw_batch_size=64,
        batch_size=2, verbose=0,
    )
    x_adv, succ = atk.generate(x, jnp.asarray(y), targeted=False, rng=jax.random.PRNGKey(0))
    assert x_adv.shape == x.shape
    assert float(jnp.abs(x_adv - x).max()) <= 0.01 + 1e-6
    assert all(succ)


def test_fakebob_fused_loop_matches_host(rng_np):
    """The on-device lax.while_loop FAKEBOB must replay the host loop exactly:
    same key schedule, same success flags, same best adversarial examples —
    including plateau LR decay and the freeze-on-solve mask."""
    x = jnp.asarray(rng_np.standard_normal((3, 1, L)).astype(np.float32) * 0.02)
    y = np.asarray(jnp.argmax(toy_model(x), axis=-1))
    kw = dict(task="SCR", epsilon=0.01, max_iter=25, max_lr=2e-3,
              samples_per_draw=32, samples_per_draw_batch_size=32,
              batch_size=3, verbose=0)
    for model_fn in (lambda xx, k: toy_model(xx), noisy_model):
        host = FAKEBOB(model_fn, **kw)
        fused = FAKEBOB(model_fn, fused_loop=True, **kw)
        adv_h, suc_h = host.generate(x, jnp.asarray(y), targeted=False, rng=jax.random.PRNGKey(7))
        adv_f, suc_f = fused.generate(x, jnp.asarray(y), targeted=False, rng=jax.random.PRNGKey(7))
        assert suc_h == suc_f
        np.testing.assert_allclose(np.asarray(adv_h), np.asarray(adv_f), atol=1e-6)


def test_fakebob_fused_loop_plateau_and_earlystop(rng_np):
    """Stress the bookkeeping corners: tiny plateau window + early-stop
    cadence short enough to fire mid-run must still match the host loop."""
    x = jnp.asarray(rng_np.standard_normal((2, 1, L)).astype(np.float32) * 0.02)
    y = np.asarray(jnp.argmax(toy_model(x), axis=-1))
    kw = dict(task="SCR", epsilon=0.004, max_iter=40, max_lr=1e-3, min_lr=2e-4,
              plateau_length=3, plateau_drop=2.0, stop_early=True,
              stop_early_iter=8, samples_per_draw=16,
              samples_per_draw_batch_size=16, batch_size=2, verbose=0)
    host = FAKEBOB(noisy_model, **kw)
    fused = FAKEBOB(noisy_model, fused_loop=True, **kw)
    adv_h, suc_h = host.generate(x, jnp.asarray(y), targeted=False, rng=jax.random.PRNGKey(3))
    adv_f, suc_f = fused.generate(x, jnp.asarray(y), targeted=False, rng=jax.random.PRNGKey(3))
    assert suc_h == suc_f
    np.testing.assert_allclose(np.asarray(adv_h), np.asarray(adv_f), atol=1e-6)


def test_siren_attacks_toy(rng_np):
    x = jnp.asarray(rng_np.standard_normal((2, 1, L)).astype(np.float32) * 0.02)
    y = np.asarray(jnp.argmax(toy_model(x), axis=-1))
    atk = SirenAttack(
        lambda xx, k: toy_model(xx), task="SCR", epsilon=0.02, max_epoch=3,
        max_iter=15, n_particles=16, batch_size=2, verbose=0,
    )
    x_adv, succ = atk.generate(x, jnp.asarray(y), targeted=False, rng=jax.random.PRNGKey(0))
    assert x_adv.shape == x.shape
    assert sum(succ) >= 1  # PSO on a linear toy should crack at least one


def test_siren_fused_loop_matches_host(rng_np):
    """The on-device nested-while_loop PSO must replay the host loop exactly:
    same key schedule (epoch reinit + per-iter r1/r2 fold-ins), same gbest
    bookkeeping, abort-early cadences, and freeze-on-solve mask."""
    x = jnp.asarray(rng_np.standard_normal((2, 1, L)).astype(np.float32) * 0.02)
    y = np.asarray(jnp.argmax(toy_model(x), axis=-1))
    kw = dict(task="SCR", epsilon=0.02, max_epoch=4, max_iter=12, n_particles=8,
              abort_early_iter=4, abort_early_epoch=2, batch_size=2, verbose=0)
    for model_fn in (lambda xx, k: toy_model(xx), noisy_model):
        host = SirenAttack(model_fn, **kw)
        fused = SirenAttack(model_fn, fused_loop=True, **kw)
        adv_h, suc_h = host.generate(x, jnp.asarray(y), targeted=False, rng=jax.random.PRNGKey(11))
        adv_f, suc_f = fused.generate(x, jnp.asarray(y), targeted=False, rng=jax.random.PRNGKey(11))
        assert suc_h == suc_f
        np.testing.assert_allclose(np.asarray(adv_h), np.asarray(adv_f), atol=1e-6)


def test_siren_fused_loop_hard_case_runs_all_epochs(rng_np):
    """With abort-early off and an unreachable margin (high confidence) both
    paths must run the full epoch budget and still agree."""
    x = jnp.asarray(rng_np.standard_normal((2, 1, L)).astype(np.float32) * 0.02)
    y = np.asarray(jnp.argmax(toy_model(x), axis=-1))
    kw = dict(task="SCR", epsilon=1e-4, confidence=50.0, max_epoch=3, max_iter=6,
              n_particles=4, abort_early=False, batch_size=2, verbose=0)
    host = SirenAttack(noisy_model, **kw)
    fused = SirenAttack(noisy_model, fused_loop=True, **kw)
    adv_h, suc_h = host.generate(x, jnp.asarray(y), targeted=False, rng=jax.random.PRNGKey(5))
    adv_f, suc_f = fused.generate(x, jnp.asarray(y), targeted=False, rng=jax.random.PRNGKey(5))
    assert suc_h == suc_f == [False, False]
    np.testing.assert_allclose(np.asarray(adv_h), np.asarray(adv_f), atol=1e-6)


def test_kenansville_fft(rng_np):
    x = jnp.asarray(rng_np.standard_normal((2, 1, L)).astype(np.float32) * 0.1)
    y = np.asarray(jnp.argmax(toy_model(x), axis=-1))
    atk = Kenansville(lambda xx, k: toy_model(xx), atk_name="fft", max_iter=10, batch_size=2, verbose=0)
    x_adv, succ = atk.generate(x, jnp.asarray(y), targeted=False, rng=jax.random.PRNGKey(0))
    assert x_adv.shape == x.shape
    assert isinstance(succ, list) and len(succ) == 2


def test_kenansville_ssa(rng_np):
    x = jnp.asarray((rng_np.standard_normal((1, 1, 400)) * 0.1).astype(np.float32))
    y = np.asarray(jnp.argmax(toy_model(jnp.zeros((1, 1, L))), axis=-1))  # arbitrary label

    def model400(xx, k):
        w = jax.random.normal(jax.random.PRNGKey(7), (400, NCLS)) * 0.5
        return xx[:, 0, :] @ w

    yy = np.asarray(jnp.argmax(model400(x, None), axis=-1))
    atk = Kenansville(model400, atk_name="ssa", max_iter=5, raster_width=100, verbose=0)
    x_adv, succ = atk.generate(x, jnp.asarray(yy), targeted=False, rng=jax.random.PRNGKey(0))
    assert x_adv.shape == x.shape


def test_ssa_reconstruction_identity(rng_np):
    from diffusion_model_for_audio_defense_tpu.ops.ssa import inv_ssa, ssa

    y = np.sin(np.linspace(0, 20, 300)) + 0.1 * rng_np.standard_normal(300)
    pc, s, v = ssa(y, 20)
    rec = inv_ssa(pc, v, np.arange(20))  # all components → exact reconstruction
    np.testing.assert_allclose(rec, y, atol=1e-8)
    rec_k = inv_ssa(pc, v, np.arange(2))  # top-2 captures the sinusoid
    assert np.corrcoef(rec_k, y)[0, 1] > 0.9


def test_bpda_straight_through():
    quantize = lambda x: jnp.round(x * 4) / 4  # non-diff (zero grad a.e.)
    qt = bpda(quantize, lambda x: x)
    x = jnp.asarray([0.3, 0.6])
    np.testing.assert_allclose(np.asarray(qt(x)), np.asarray(quantize(x)))
    g = jax.grad(lambda v: jnp.sum(qt(v) ** 2))(x)
    # straight-through: d/dx (q(x)^2) ≈ 2·q(x)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(quantize(x)), atol=1e-6)


def test_masker_threshold_shape_and_sanity():
    t = np.linspace(0, 1, 16000)
    audio = (0.3 * np.sin(2 * np.pi * 440 * t) + 0.05 * np.sin(2 * np.pi * 3000 * t)).astype(np.float32)
    masker = PsychoacousticMasker()
    th, psd_max = masker.calculate_threshold_and_psd_maximum(audio)
    n_frames = 1 + (16000 - 2048) // 512
    assert th.shape == (1025, n_frames)
    assert np.isfinite(th).all()
    psd, pmax = masker.power_spectral_density(audio)
    assert psd.max() <= 96.0 + 1e-6 and pmax == float(pmax)
    # the 440 Hz tone bin should be a masker: threshold near it well above ATH minimum
    assert th.mean() > -100


def test_eot_chunked_matches_deterministic(rng_np):
    x = jnp.asarray(rng_np.standard_normal((2, 1, L)).astype(np.float32)) * 0.1
    y = jnp.asarray([0, 1])
    # deterministic model: chunking must not change averages at all
    det = lambda xx, k: toy_model(xx)
    full = EOT(det, cross_entropy, eot_size=8)
    chunked = EOT(det, cross_entropy, eot_size=8, eot_batch_size=3)
    s1, l1, g1, d1 = full(x, y, jax.random.PRNGKey(0))
    s2, l2, g2, d2 = chunked(x, y, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)
    assert d2.shape == (8, 2)


def test_margin_loss_sv_osi_formulas():
    """SV/OSI margin branches (SEC4SR semantics the reference's resolver
    points at, _utils.py:107-110): hand-computed values, -1 = rejected."""
    from diffusion_model_for_audio_defense_tpu.attacks import make_decision, margin_loss

    # SV: single score column, threshold 0.5
    s = jnp.asarray([[0.8], [0.2]])
    y = jnp.asarray([0, -1])
    un = margin_loss(s, y, targeted=False, task="SV", threshold=0.5, clip_max=False)
    # accepted input: s - theta = 0.3 ; rejected input: theta - s = 0.3
    np.testing.assert_allclose(np.asarray(un), [0.3, 0.3], atol=1e-6)
    tg = margin_loss(s, y, targeted=True, task="SV", threshold=0.5, clip_max=False)
    # enrolled targeted: theta - s = -0.3; imposter targeted (the reference's
    # enroll->imposter DoS branch, _utils.py:55-57): s - theta = -0.3
    np.testing.assert_allclose(np.asarray(tg), [-0.3, -0.3], atol=1e-6)

    # OSI: threshold 1.0
    sc = jnp.asarray([[2.0, 0.5, 0.1], [0.4, 0.9, 0.2]])
    yo = jnp.asarray([0, -1])
    un = margin_loss(sc, yo, targeted=False, task="OSI", threshold=1.0, clip_max=False)
    # enrolled: s_y - max(other, theta) = 2.0 - 1.0 ; rejected: theta - max = 0.1
    np.testing.assert_allclose(np.asarray(un), [1.0, 0.1], atol=1e-6)
    tg = margin_loss(sc, jnp.asarray([1, 1]), targeted=True, task="OSI",
                     threshold=1.0, clip_max=False)
    # target 1: max(other, theta) - s_t = 2.0-0.5 ; 1.0-0.9
    np.testing.assert_allclose(np.asarray(tg), [1.5, 0.1], atol=1e-6)

    d = make_decision(sc, "OSI", 1.0)
    np.testing.assert_array_equal(np.asarray(d), [0, -1])
    d = make_decision(s, "SV", 0.5)
    np.testing.assert_array_equal(np.asarray(d), [0, -1])


def test_resolve_loss_sv_forces_margin():
    import warnings

    from diffusion_model_for_audio_defense_tpu.attacks import resolve_loss

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        loss, sign = resolve_loss("Entropy", False, 0.0, "OSI", threshold=1.0)
        assert sign == -1 and any("Margin" in str(x.message) for x in w)
    s = jnp.asarray([[2.0, 0.5]])
    assert float(loss(s, jnp.asarray([0]))[0]) > 0


def test_fakebob_estimate_threshold_toy_osi(rng_np):
    """Toy OSI system with a known threshold: a linear score head whose max
    score rises with the input mean. The estimate must land within ~step of
    the true threshold."""
    from diffusion_model_for_audio_defense_tpu.attacks import make_decision
    from diffusion_model_for_audio_defense_tpu.attacks.fakebob import FAKEBOB

    true_theta = 0.30

    def model_fn(x, key=None):
        m = jnp.mean(x, axis=(1, 2))
        return jnp.stack([m * 4.0, m * 2.0], axis=-1)

    atk = FAKEBOB(model_fn, task="OSI", epsilon=0.2, max_lr=0.02,
                  samples_per_draw=10, sigma=0.01, verbose=0)
    x = jnp.full((1, 1, 64), 0.05)  # max score 0.2 < theta -> rejected
    theta = atk.estimate_threshold(
        x, step=0.1, decision_fn=lambda s: make_decision(s, "OSI", true_theta),
        rng=jax.random.PRNGKey(0))
    assert theta is not None
    assert abs(theta - true_theta) < 0.1, theta
    # accepted inputs carry no information
    x_acc = jnp.full((1, 1, 64), 0.2)
    atk2 = FAKEBOB(model_fn, task="OSI", verbose=0)
    assert atk2.estimate_threshold(
        x_acc, decision_fn=lambda s: make_decision(s, "OSI", true_theta)) is None


def test_fakebob_estimate_threshold_terminates_on_stall(rng_np):
    """A score-insensitive model (NES can't push the score up) used to spin
    the inner estimation loop forever; with the max_inner bound it must
    terminate and return None."""
    import time

    from diffusion_model_for_audio_defense_tpu.attacks import make_decision
    from diffusion_model_for_audio_defense_tpu.attacks.fakebob import FAKEBOB

    def model_fn(x, key=None):
        b = x.shape[0]
        return jnp.tile(jnp.asarray([[0.1, 0.05]]), (b, 1))  # constant scores

    atk = FAKEBOB(model_fn, task="OSI", epsilon=0.01, samples_per_draw=4,
                  sigma=0.01, verbose=0)
    x = jnp.zeros((1, 1, 64))
    t0 = time.time()
    theta = atk.estimate_threshold(
        x, step=0.5, decision_fn=lambda s: make_decision(s, "OSI", 5.0),
        rng=jax.random.PRNGKey(0))
    assert theta is None
    assert time.time() - t0 < 300  # bounded, not an endless spin


def _mk_attacks(model_fn, fused, **kw):
    base = dict(eps=2000.0, norm="linf", max_iter_1=25, max_iter_2=0,
                learning_rate_1=400.0, verbose=0)
    base.update(kw)
    return AudioAttack(model_fn, fused_stage_1=fused, **base)


def test_fused_stage1_matches_host_deterministic(rng_np):
    """The lax.fori_loop stage 1 replays the host loop exactly: same key
    schedule, same ε-shrink bookkeeping, same latest-hit tracking."""
    x = jnp.asarray(rng_np.standard_normal((4, 1, L)).astype(np.float32) * 0.05)
    y = np.asarray(jnp.argmax(toy_model(x), axis=-1))
    model_fn = lambda xx, rng: toy_model(xx)
    # 25 iters crosses the eps-shrink boundaries at i = 10, 20
    host = _mk_attacks(model_fn, fused=False)
    fused = _mk_attacks(model_fn, fused=True)
    xa_h, (s_h, _) = host.generate(x, jnp.asarray(y), targeted=False, rng=jax.random.PRNGKey(0))
    xa_f, (s_f, _) = fused.generate(x, jnp.asarray(y), targeted=False, rng=jax.random.PRNGKey(0))
    assert list(s_h) == list(s_f)
    np.testing.assert_allclose(np.asarray(xa_f), np.asarray(xa_h), atol=2e-6)


def test_fused_stage1_matches_host_l2_and_targeted(rng_np):
    x = jnp.asarray(rng_np.standard_normal((3, 1, L)).astype(np.float32) * 0.05)
    y_true = np.asarray(jnp.argmax(toy_model(x), axis=-1))
    y_tgt = jnp.asarray((y_true + 1) % NCLS)
    model_fn = lambda xx, rng: toy_model(xx)
    host = _mk_attacks(model_fn, fused=False, norm="l2", eps=30000.0, learning_rate_1=3000.0)
    fused = _mk_attacks(model_fn, fused=True, norm="l2", eps=30000.0, learning_rate_1=3000.0)
    xa_h, (s_h, _) = host.generate(x, y_tgt, targeted=True, rng=jax.random.PRNGKey(2))
    xa_f, (s_f, _) = fused.generate(x, y_tgt, targeted=True, rng=jax.random.PRNGKey(2))
    assert list(s_h) == list(s_f)
    np.testing.assert_allclose(np.asarray(xa_f), np.asarray(xa_h), atol=2e-6)


def test_fused_stage1_matches_host_with_eot_stochastic(rng_np):
    """Key-schedule parity holds through the EOT mirrors: a stochastic
    defense sees identical noise on both paths."""
    x = jnp.asarray(rng_np.standard_normal((2, 1, L)).astype(np.float32) * 0.05)
    y = np.asarray(jnp.argmax(toy_model(x), axis=-1))
    kw = dict(max_iter_1=12, eot_attack_size=3, eot_defense_size=3)
    host = _mk_attacks(noisy_model, fused=False, **kw)
    fused = _mk_attacks(noisy_model, fused=True, **kw)
    xa_h, (s_h, _) = host.generate(x, jnp.asarray(y), targeted=False, rng=jax.random.PRNGKey(4))
    xa_f, (s_f, _) = fused.generate(x, jnp.asarray(y), targeted=False, rng=jax.random.PRNGKey(4))
    assert list(s_h) == list(s_f)
    np.testing.assert_allclose(np.asarray(xa_f), np.asarray(xa_h), atol=2e-6)


def test_kenansville_fft_fused_matches_host(rng_np):
    """fused_loop=True: whole binary search on device, exact host parity —
    deterministic AND stochastic (keyed) models share the key schedule."""
    x = jnp.asarray(rng_np.standard_normal((3, 1, L)).astype(np.float32) * 0.1)
    y = jnp.argmax(toy_model(x), axis=-1)
    kw = dict(atk_name="fft", max_iter=8, batch_size=3, verbose=0)
    for model_fn in (lambda xx, k: toy_model(xx), noisy_model):
        host = Kenansville(model_fn, **kw)
        fused = Kenansville(model_fn, fused_loop=True, **kw)
        adv_h, suc_h = host.generate(x, y, targeted=False, rng=jax.random.PRNGKey(3))
        adv_f, suc_f = fused.generate(x, y, targeted=False, rng=jax.random.PRNGKey(3))
        assert suc_h == suc_f
        np.testing.assert_allclose(np.asarray(adv_h), np.asarray(adv_f), atol=1e-5)


def test_kenansville_fft_fused_targeted_and_multibatch(rng_np):
    """Targeted hit condition + the per-batch key split both match the host."""
    x = jnp.asarray(rng_np.standard_normal((4, 1, L)).astype(np.float32) * 0.1)
    y_tgt = (jnp.argmax(toy_model(x), axis=-1) + 1) % NCLS
    kw = dict(atk_name="fft", max_iter=6, batch_size=2, verbose=0)  # 2 batches of 2
    host = Kenansville(lambda xx, k: toy_model(xx), **kw)
    fused = Kenansville(lambda xx, k: toy_model(xx), fused_loop=True, **kw)
    adv_h, suc_h = host.generate(x, y_tgt, targeted=True, rng=jax.random.PRNGKey(9))
    adv_f, suc_f = fused.generate(x, y_tgt, targeted=True, rng=jax.random.PRNGKey(9))
    assert suc_h == suc_f
    np.testing.assert_allclose(np.asarray(adv_h), np.asarray(adv_f), atol=1e-5)
