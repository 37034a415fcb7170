"""GaussianDiffusion — full improved-diffusion math in JAX.

Rebuild of ``improved_diffusion/gaussian_diffusion.py`` (OpenAI): named beta
schedules (with the 1000/T linear rescale), float64 schedule precompute,
q-sampling, posterior, ``p_mean_variance`` with FIXED/LEARNED(-RANGE)
variance handling and x0 clipping, ancestral and DDIM sampling loops as
``lax.scan``, and the MSE/RESCALED_MSE/KL training losses with the
frozen-mean VB term.

Enums are plain strings; the model is any ``model_fn(x, t) -> out`` with
``out`` channels doubled when the variance is learned.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

# model mean types: "eps" | "xstart" | "xprev"
# variance types:   "fixed_small" | "fixed_large" | "learned" | "learned_range"
# loss types:       "mse" | "rescaled_mse" | "kl" | "rescaled_kl"


def get_named_beta_schedule(schedule_name: str, num_diffusion_timesteps: int) -> np.ndarray:
    """Reference ``gaussian_diffusion.py:18-62``: 'linear' is calibrated for
    1000 steps and rescaled by 1000/T for other step counts."""
    if schedule_name == "linear":
        scale = 1000 / num_diffusion_timesteps
        return np.linspace(scale * 0.0001, scale * 0.02, num_diffusion_timesteps, dtype=np.float64)
    if schedule_name == "cosine":
        f = lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
        T = num_diffusion_timesteps
        return np.array([min(1 - f((t + 1) / T) / f(t / T), 0.999) for t in range(T)])
    raise NotImplementedError(f"unknown beta schedule: {schedule_name}")


def _ext(arr: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather arr[t] and right-broadcast to ndim dims."""
    out = arr[t]
    return out.reshape(out.shape + (1,) * (ndim - out.ndim))


def normal_kl(mean1, logvar1, mean2, logvar2):
    return 0.5 * (-1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2) + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2))


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x**3)))


def discretized_gaussian_log_likelihood(x, means, log_scales):
    """Log-likelihood of discretizing to 8-bit-style bins of width 1/127.5
    (reference ``losses.py`` in improved-diffusion)."""
    centered = x - means
    inv_std = jnp.exp(-log_scales)
    plus_in = inv_std * (centered + 1.0 / 255.0)
    min_in = inv_std * (centered - 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.maximum(cdf_plus, 1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.maximum(1.0 - cdf_min, 1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min, jnp.log(jnp.maximum(cdf_delta, 1e-12))),
    )


@dataclass(frozen=True)
class GaussianDiffusion:
    betas: np.ndarray
    model_mean_type: str = "eps"
    model_var_type: str = "fixed_large"
    loss_type: str = "mse"
    rescale_timesteps: bool = False

    # derived (filled in __post_init__)
    num_timesteps: int = field(init=False)

    def __post_init__(self):
        betas = np.asarray(self.betas, dtype=np.float64)
        assert (betas > 0).all() and (betas <= 1).all()
        object.__setattr__(self, "betas", betas)
        object.__setattr__(self, "num_timesteps", int(betas.shape[0]))

        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        acp_prev = np.append(1.0, acp[:-1])
        acp_next = np.append(acp[1:], 0.0)
        # acp can underflow to exactly 0 at the last steps of short rescaled
        # schedules (β_t → 1); the reciprocal coefficients are then inf, which
        # matches the reference float64 arithmetic (gaussian_diffusion.py:
        # sqrt_recip_alphas_cumprod) — those rows are only gathered at t where
        # acp > 0 in every sampling path, so silence the expected divide.
        with np.errstate(divide="ignore"):
            d = {
                "alphas_cumprod": acp,
                "alphas_cumprod_prev": acp_prev,
                "alphas_cumprod_next": acp_next,
                "sqrt_alphas_cumprod": np.sqrt(acp),
                "sqrt_one_minus_alphas_cumprod": np.sqrt(1.0 - acp),
                "log_one_minus_alphas_cumprod": np.log(1.0 - acp),
                "sqrt_recip_alphas_cumprod": np.sqrt(1.0 / acp),
                "sqrt_recipm1_alphas_cumprod": np.sqrt(1.0 / acp - 1.0),
            }
        post_var = betas * (1.0 - acp_prev) / (1.0 - acp)
        d["posterior_variance"] = post_var
        d["posterior_log_variance_clipped"] = np.log(np.append(post_var[1], post_var[1:]))
        d["posterior_mean_coef1"] = betas * np.sqrt(acp_prev) / (1.0 - acp)
        d["posterior_mean_coef2"] = (1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)
        for k, v in d.items():
            object.__setattr__(self, k, jnp.asarray(v, dtype=jnp.float32))

    # ------------------------------------------------------------ q process

    def q_mean_variance(self, x_start, t):
        mean = _ext(self.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        var = _ext(1.0 - self.alphas_cumprod, t, x_start.ndim)
        logvar = _ext(self.log_one_minus_alphas_cumprod, t, x_start.ndim)
        return mean, var, logvar

    def q_sample(self, x_start, t, noise):
        return (
            _ext(self.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + _ext(self.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
        )

    def q_posterior_mean_variance(self, x_start, x_t, t):
        mean = (
            _ext(self.posterior_mean_coef1, t, x_t.ndim) * x_start
            + _ext(self.posterior_mean_coef2, t, x_t.ndim) * x_t
        )
        var = _ext(self.posterior_variance, t, x_t.ndim)
        logvar = _ext(self.posterior_log_variance_clipped, t, x_t.ndim)
        return mean, var, logvar

    # ------------------------------------------------------------ p process

    def _scale_t(self, t):
        if self.rescale_timesteps:
            return t.astype(jnp.float32) * (1000.0 / self.num_timesteps)
        return t

    def _predict_xstart_from_eps(self, x_t, t, eps):
        return (
            _ext(self.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - _ext(self.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * eps
        )

    def _predict_xstart_from_xprev(self, x_t, t, xprev):
        c1 = _ext(1.0 / self.posterior_mean_coef1, t, x_t.ndim)
        c2 = _ext(self.posterior_mean_coef2 / self.posterior_mean_coef1, t, x_t.ndim)
        return c1 * xprev - c2 * x_t

    def _predict_eps_from_xstart(self, x_t, t, x0):
        return (
            _ext(self.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - x0
        ) / _ext(self.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)

    def p_mean_variance(self, model_fn: Callable, x, t, clip_denoised: bool = True):
        """Reference ``gaussian_diffusion.py:232-326``. Returns dict with
        mean/variance/log_variance/pred_xstart."""
        B, C = x.shape[0], x.shape[1]
        out = model_fn(x, self._scale_t(t))

        if self.model_var_type in ("learned", "learned_range"):
            model_output, model_var_values = jnp.split(out, 2, axis=1)
            if self.model_var_type == "learned":
                model_log_variance = model_var_values
                model_variance = jnp.exp(model_log_variance)
            else:
                min_log = _ext(self.posterior_log_variance_clipped, t, x.ndim)
                max_log = _ext(jnp.log(jnp.asarray(self.betas, jnp.float32)), t, x.ndim)
                frac = (model_var_values + 1) / 2
                model_log_variance = frac * max_log + (1 - frac) * min_log
                model_variance = jnp.exp(model_log_variance)
        else:
            model_output = out
            if self.model_var_type == "fixed_large":
                var = jnp.concatenate([self.posterior_variance[1:2], jnp.asarray(self.betas[1:], jnp.float32)])
                model_variance = _ext(var, t, x.ndim)
                model_log_variance = jnp.log(model_variance)
            else:  # fixed_small
                model_variance = _ext(self.posterior_variance, t, x.ndim)
                model_log_variance = _ext(self.posterior_log_variance_clipped, t, x.ndim)

        clip = (lambda v: jnp.clip(v, -1, 1)) if clip_denoised else (lambda v: v)
        if self.model_mean_type == "xprev":
            pred_xstart = clip(self._predict_xstart_from_xprev(x, t, model_output))
            model_mean = model_output
        elif self.model_mean_type == "xstart":
            pred_xstart = clip(model_output)
            model_mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)
        else:  # eps
            pred_xstart = clip(self._predict_xstart_from_eps(x, t, model_output))
            model_mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)

        return {
            "mean": model_mean,
            "variance": model_variance,
            "log_variance": model_log_variance,
            "pred_xstart": pred_xstart,
        }

    def p_sample(self, model_fn, x, t, rng, clip_denoised: bool = True):
        out = self.p_mean_variance(model_fn, x, t, clip_denoised)
        noise = jax.random.normal(rng, x.shape, dtype=x.dtype)
        nonzero = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
        sample = out["mean"] + nonzero * jnp.exp(0.5 * out["log_variance"]) * noise
        return sample, out["pred_xstart"]

    def p_sample_loop(self, model_fn, shape=None, rng=None, x_t=None, t_start: Optional[int] = None,
                      clip_denoised: bool = True, remat: bool = True):
        """Ancestral loop from t_start-1 … 0 (full T if x_t None: starts from
        pure noise). lax.scan — differentiable."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if x_t is None:
            rng, k = jax.random.split(rng)
            x_t = jax.random.normal(k, shape)
            t_start = self.num_timesteps
        t_start = t_start if t_start is not None else self.num_timesteps
        ts = jnp.arange(t_start - 1, -1, -1)
        keys = jax.random.split(rng, t_start)
        bsz = x_t.shape[0]

        def body(x, inp):
            t, key = inp
            x, _ = self.p_sample(model_fn, x, jnp.full((bsz,), t), key, clip_denoised)
            return x, None

        if remat:
            body = jax.checkpoint(body)
        x0, _ = jax.lax.scan(body, x_t, (ts, keys))
        return x0

    def ddim_sample(self, model_fn, x, t, rng, clip_denoised: bool = True, eta: float = 0.0):
        out = self.p_mean_variance(model_fn, x, t, clip_denoised)
        eps = self._predict_eps_from_xstart(x, t, out["pred_xstart"])
        abar = _ext(self.alphas_cumprod, t, x.ndim)
        abar_prev = _ext(self.alphas_cumprod_prev, t, x.ndim)
        sigma = eta * jnp.sqrt((1 - abar_prev) / (1 - abar)) * jnp.sqrt(1 - abar / abar_prev)
        mean_pred = out["pred_xstart"] * jnp.sqrt(abar_prev) + jnp.sqrt(1 - abar_prev - sigma**2) * eps
        noise = jax.random.normal(rng, x.shape, dtype=x.dtype)
        nonzero = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
        return mean_pred + nonzero * sigma * noise, out["pred_xstart"]

    def ddim_sample_loop(self, model_fn, shape=None, rng=None, x_t=None, t_start: Optional[int] = None,
                         clip_denoised: bool = True, eta: float = 0.0):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if x_t is None:
            rng, k = jax.random.split(rng)
            x_t = jax.random.normal(k, shape)
            t_start = self.num_timesteps
        t_start = t_start if t_start is not None else self.num_timesteps
        ts = jnp.arange(t_start - 1, -1, -1)
        keys = jax.random.split(rng, t_start)
        bsz = x_t.shape[0]

        def body(x, inp):
            t, key = inp
            x, _ = self.ddim_sample(model_fn, x, jnp.full((bsz,), t), key, clip_denoised, eta)
            return x, None

        x0, _ = jax.lax.scan(jax.checkpoint(body), x_t, (ts, keys))
        return x0

    def ddim_reverse_sample(self, model_fn, x, t, clip_denoised: bool = True, eta: float = 0.0):
        """Deterministic DDIM reverse-ODE step x_t → x_{t+1} (the encoder
        direction; reference ``gaussian_diffusion.py:524-560``). Returns
        ``(sample, pred_xstart)``."""
        assert eta == 0.0, "Reverse ODE only for deterministic path"
        out = self.p_mean_variance(model_fn, x, t, clip_denoised)
        eps = (
            _ext(self.sqrt_recip_alphas_cumprod, t, x.ndim) * x - out["pred_xstart"]
        ) / _ext(self.sqrt_recipm1_alphas_cumprod, t, x.ndim)
        abar_next = _ext(self.alphas_cumprod_next, t, x.ndim)
        mean_pred = out["pred_xstart"] * jnp.sqrt(abar_next) + jnp.sqrt(1 - abar_next) * eps
        return mean_pred, out["pred_xstart"]

    def ddim_reverse_sample_loop(self, model_fn, x0, t_end: Optional[int] = None,
                                 clip_denoised: bool = True):
        """DDIM-encode x_0 up to x_{t_end} by scanning the reverse ODE over
        t = 0 … t_end-1 — the deterministic latent encoder paired with
        ``ddim_sample_loop`` (single-step reference ``:524-560``; the loop is
        the standard composition, done here as one ``lax.scan``)."""
        t_end = t_end if t_end is not None else self.num_timesteps
        bsz = x0.shape[0]

        def body(x, t):
            x, _ = self.ddim_reverse_sample(model_fn, x, jnp.full((bsz,), t), clip_denoised)
            return x, None

        x_t, _ = jax.lax.scan(jax.checkpoint(body), x0, jnp.arange(t_end))
        return x_t

    # ----------------------------------------------- progressive generators

    def p_sample_loop_progressive(self, model_fn, shape=None, rng=None, x_t=None,
                                  t_start: Optional[int] = None, clip_denoised: bool = True):
        """Yield per-step dicts ``{"sample", "pred_xstart"}`` from t_start-1
        down to 0 (reference ``gaussian_diffusion.py:431-478``). A host-level
        generator — each step is one device call; use ``p_sample_loop`` (the
        fused scan) when intermediates aren't needed."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if x_t is None:
            rng, k = jax.random.split(rng)
            x_t = jax.random.normal(k, shape)
            t_start = self.num_timesteps
        t_start = t_start if t_start is not None else self.num_timesteps
        bsz = x_t.shape[0]
        x = x_t
        for t in range(t_start - 1, -1, -1):
            rng, k = jax.random.split(rng)
            x, pred_xstart = self.p_sample(model_fn, x, jnp.full((bsz,), t), k, clip_denoised)
            yield {"sample": x, "pred_xstart": pred_xstart}

    def ddim_sample_loop_progressive(self, model_fn, shape=None, rng=None, x_t=None,
                                     t_start: Optional[int] = None, clip_denoised: bool = True,
                                     eta: float = 0.0):
        """DDIM analogue of ``p_sample_loop_progressive`` (reference
        ``gaussian_diffusion.py:594-641``)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if x_t is None:
            rng, k = jax.random.split(rng)
            x_t = jax.random.normal(k, shape)
            t_start = self.num_timesteps
        t_start = t_start if t_start is not None else self.num_timesteps
        bsz = x_t.shape[0]
        x = x_t
        for t in range(t_start - 1, -1, -1):
            rng, k = jax.random.split(rng)
            x, pred_xstart = self.ddim_sample(model_fn, x, jnp.full((bsz,), t), k, clip_denoised, eta)
            yield {"sample": x, "pred_xstart": pred_xstart}

    # --------------------------------------------------------------- losses

    def _vb_terms_bpd(self, model_fn, x_start, x_t, t, clip_denoised: bool = True):
        true_mean, _, true_logvar = self.q_posterior_mean_variance(x_start, x_t, t)
        out = self.p_mean_variance(model_fn, x_t, t, clip_denoised)
        kl = normal_kl(true_mean, true_logvar, out["mean"], out["log_variance"])
        kl = kl.reshape(kl.shape[0], -1).mean(axis=1) / np.log(2.0)
        decoder_nll = -discretized_gaussian_log_likelihood(x_start, out["mean"], 0.5 * out["log_variance"])
        decoder_nll = decoder_nll.reshape(decoder_nll.shape[0], -1).mean(axis=1) / np.log(2.0)
        output = jnp.where(t == 0, decoder_nll, kl)
        return {"output": output, "pred_xstart": out["pred_xstart"]}

    def training_losses(self, model_fn, x_start, t, rng):
        """Per-sample loss dict (reference ``:677-750``)."""
        noise = jax.random.normal(rng, x_start.shape, dtype=x_start.dtype)
        x_t = self.q_sample(x_start, t, noise)
        terms = {}

        if self.loss_type in ("kl", "rescaled_kl"):
            terms["loss"] = self._vb_terms_bpd(model_fn, x_start, x_t, t, clip_denoised=False)["output"]
            if self.loss_type == "rescaled_kl":
                terms["loss"] = terms["loss"] * self.num_timesteps
            return terms

        out = model_fn(x_t, self._scale_t(t))
        if self.model_var_type in ("learned", "learned_range"):
            model_output, model_var_values = jnp.split(out, 2, axis=1)
            # VB term with frozen mean (stop-grad on the ε half)
            frozen = jnp.concatenate([jax.lax.stop_gradient(model_output), model_var_values], axis=1)
            terms["vb"] = self._vb_terms_bpd(lambda *_: frozen, x_start, x_t, t, clip_denoised=False)["output"]
            if self.loss_type == "rescaled_mse":
                terms["vb"] = terms["vb"] * self.num_timesteps / 1000.0
        else:
            model_output = out

        target = {
            "xprev": self.q_posterior_mean_variance(x_start, x_t, t)[0],
            "xstart": x_start,
            "eps": noise,
        }[self.model_mean_type]
        terms["mse"] = ((target - model_output) ** 2).reshape(x_start.shape[0], -1).mean(axis=1)
        terms["loss"] = terms["mse"] + terms["vb"] if "vb" in terms else terms["mse"]
        return terms

    # ------------------------------------------------------------- NLL eval

    def _prior_bpd(self, x_start):
        """Prior KL term of the VLB in bits/dim (reference ``:752-768``)."""
        bsz = x_start.shape[0]
        t = jnp.full((bsz,), self.num_timesteps - 1)
        qt_mean, _, qt_logvar = self.q_mean_variance(x_start, t)
        kl = normal_kl(qt_mean, qt_logvar, 0.0, 0.0)
        return kl.reshape(bsz, -1).mean(axis=1) / np.log(2.0)

    def calc_bpd_loop(self, model_fn, x_start, rng, clip_denoised: bool = True):
        """Full variational lower-bound in bits/dim (reference ``:771-826``).

        The reference's Python loop over t = T-1 … 0 becomes a ``lax.scan``;
        rows of the returned (N, T) arrays are ordered t = T-1 first, like
        the reference's stacking order. Returns ``total_bpd``, ``prior_bpd``,
        ``vb``, ``xstart_mse``, ``mse``.
        """
        bsz = x_start.shape[0]
        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        keys = jax.random.split(rng, self.num_timesteps)

        def body(carry, inp):
            t, key = inp
            tb = jnp.full((bsz,), t)
            noise = jax.random.normal(key, x_start.shape, dtype=x_start.dtype)
            x_t = self.q_sample(x_start, tb, noise)
            out = self._vb_terms_bpd(model_fn, x_start, x_t, tb, clip_denoised)
            xstart_mse = ((out["pred_xstart"] - x_start) ** 2).reshape(bsz, -1).mean(axis=1)
            eps = self._predict_eps_from_xstart(x_t, tb, out["pred_xstart"])
            mse = ((eps - noise) ** 2).reshape(bsz, -1).mean(axis=1)
            return carry, (out["output"], xstart_mse, mse)

        _, (vb, xstart_mse, mse) = jax.lax.scan(body, 0.0, (ts, keys))
        vb, xstart_mse, mse = (jnp.swapaxes(a, 0, 1) for a in (vb, xstart_mse, mse))
        prior_bpd = self._prior_bpd(x_start)
        return {
            "total_bpd": vb.sum(axis=1) + prior_bpd,
            "prior_bpd": prior_bpd,
            "vb": vb,
            "xstart_mse": xstart_mse,
            "mse": mse,
        }


def create_gaussian_diffusion(
    steps: int = 200,
    learn_sigma: bool = False,
    sigma_small: bool = False,
    noise_schedule: str = "linear",
    use_kl: bool = False,
    predict_xstart: bool = False,
    rescale_timesteps: bool = False,
    rescale_learned_sigmas: bool = True,
    timestep_respacing: str = "",
):
    """Factory mirroring ``script_util.create_gaussian_diffusion`` (:231-269)."""
    from .respace import SpacedDiffusion, space_timesteps

    betas = get_named_beta_schedule(noise_schedule, steps)
    if use_kl:
        loss_type = "rescaled_kl"
    elif rescale_learned_sigmas:
        loss_type = "rescaled_mse"
    else:
        loss_type = "mse"
    if not timestep_respacing:
        timestep_respacing = [steps]
    return SpacedDiffusion(
        use_timesteps=space_timesteps(steps, timestep_respacing),
        betas=betas,
        model_mean_type="xstart" if predict_xstart else "eps",
        model_var_type=(
            ("fixed_large" if not sigma_small else "fixed_small") if not learn_sigma else "learned_range"
        ),
        loss_type=loss_type,
        rescale_timesteps=rescale_timesteps,
    )
