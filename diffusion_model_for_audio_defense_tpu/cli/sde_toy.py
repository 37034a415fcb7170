"""Toy VP-SDE sanity harness.

Real equivalent of the reference's gitignored scratch script ``sde_toy.py``
(listed in ``.gitignore:9``; invoked by no launcher): validate the
Euler–Maruyama reverse-SDE machinery used by the waveform/spectrogram
purifiers on a problem with a KNOWN exact score — a 1-D two-component
Gaussian mixture — instead of a learned ε-net.

Under the VP forward SDE, a mixture N(±m, s²) diffuses to a mixture
N(±m·√ᾱ(t), s²ᾱ(t) + 1−ᾱ(t)) in closed form, so the exact score (and the
equivalent ε(x,t) = −√(1−ᾱ)·score) is available analytically. Running the
production ``vpsde_reverse`` scan with that ε must carry pure-noise samples
back to the bimodal data distribution. The driver reports the recovered
mixture moments and a two-sample energy distance against fresh data draws,
and fails loudly if the reverse solve collapses the modes.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n_samples", type=int, default=4096)
    p.add_argument("--mode", type=float, default=2.0, help="mixture mode at ±mode")
    p.add_argument("--scale", type=float, default=0.3, help="per-component std")
    p.add_argument("--T", type=int, default=200)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--plot", type=str, default=None, help="optional histogram png path")
    return p


def _mixture_eps_fn(schedule, m: float, s: float):
    """Exact ε(x, t) for the diffused two-mode mixture (weights ½/½)."""
    abar = schedule.alpha_bar

    def eps_fn(x, t):
        d = jnp.clip(t[0].astype(jnp.int32), 0, schedule.T - 1)
        a = abar[d]
        mu = m * jnp.sqrt(a)
        var = s * s * a + (1.0 - a)
        # responsibilities of the two components
        lp = -0.5 * (x - mu) ** 2 / var
        ln = -0.5 * (x + mu) ** 2 / var
        w = jax.nn.sigmoid(lp - ln)  # P(component +1 | x)
        score = (w * (mu - x) + (1.0 - w) * (-mu - x)) / var
        return -jnp.sqrt(1.0 - a) * score

    return eps_fn


def energy_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Two-sample energy distance E|X−Y|·2 − E|X−X'| − E|Y−Y'| (1-D)."""
    a = np.sort(a.ravel())
    b = np.sort(b.ravel())
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    cross = np.abs(a[:, None] - b[None, :]).mean()
    return float(2 * cross - np.abs(a[:, None] - a[None, :]).mean() - np.abs(b[:, None] - b[None, :]).mean())


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ..core.schedules import vpsde_schedule
    from ..purify.sde import vpsde_reverse

    schedule = vpsde_schedule(args.T, 0.02, 4.0)
    eps_fn = _mixture_eps_fn(schedule, args.mode, args.scale)

    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(args.seed), 3)
    signs = jax.random.bernoulli(k2, 0.5, (args.n_samples,))
    data = np.asarray(
        jnp.where(signs, args.mode, -args.mode)
        + args.scale * jax.random.normal(jax.random.fold_in(k2, 1), (args.n_samples,))
    )

    # seed the reverse solve from the TRUE t=T marginal by q-jumping an
    # INDEPENDENT mixture draw (ᾱ(T) is not ~0 for this schedule, so N(0,1)
    # would bias the start) — exactly how the purifiers enter the reverse SDE
    from ..purify.ddpm import q_jump

    signs2 = jax.random.bernoulli(jax.random.fold_in(k2, 2), 0.5, (args.n_samples,))
    seed_draws = (jnp.where(signs2, args.mode, -args.mode)
                  + args.scale * jax.random.normal(jax.random.fold_in(k2, 3), (args.n_samples,)))
    x_T = q_jump(schedule, seed_draws[:, None, None], args.T, k0)
    x_0 = vpsde_reverse(eps_fn, schedule, x_T, args.T, k1)
    x_0 = np.asarray(x_0).ravel()

    frac_pos = float((x_0 > 0).mean())
    mode_mean = float(np.abs(x_0).mean())
    ed = energy_distance(x_0[:2048], data[:2048])
    print(f"reverse-SDE samples: mean|x|={mode_mean:.3f} (target {args.mode:.3f}), "
          f"P(x>0)={frac_pos:.3f} (target 0.5), energy distance={ed:.4f}")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 3))
        ax.hist(data, bins=80, alpha=0.5, density=True, label="data")
        ax.hist(x_0, bins=80, alpha=0.5, density=True, label="reverse SDE")
        ax.legend()
        fig.tight_layout()
        fig.savefig(args.plot, dpi=120)
        print(f"wrote {args.plot}")

    ok = abs(mode_mean - args.mode) < 0.5 and 0.3 < frac_pos < 0.7 and ed < 0.2
    if not ok:
        raise SystemExit(f"toy reverse SDE failed sanity bounds (mean|x|={mode_mean}, "
                         f"P(x>0)={frac_pos}, ed={ed})")
    print("sde_toy OK")
    return ed


if __name__ == "__main__":
    main()
