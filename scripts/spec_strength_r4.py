"""Strong-noise / strong-attack addendum to the real-weights spec artifact.

The prod spec eval (scripts/train_real_spec.py stage_eval) only probed
q-sample noise at t* ∈ {3, 10}, where the mel classifier barely degrades
(0.95 → 0.93/0.87) — there is nothing for the purifier to recover, so
``denoised_acc > noisy_acc`` cannot show up (the wave-domain artifact needed
σ=1.0, where noisy acc craters to 0.19, to show its 1.00 recovery). This
addendum re-runs the same sanity at destruction-scale t* ∈ {25, 50, 100}
and re-runs the CW attack at a budget that matters (eps=2000 ≈ 0.061,
100 iters — the prod eps=65 run left undefended == defended at 30%).

Writes ``artifacts/real_spec/spec_strong.json`` and merges into
``artifacts/real_spec/summary.json``.

Run on the TPU (one axon client at a time):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/spec_strength_r4.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "artifacts", "real_spec")
TEST_DIR = os.path.join(REPO, "artifacts", "real_diffwave", "synth_sc09_test")
CLF_EVAL = os.path.join(OUT, "resnext_synth_eval")
UNET_FINAL = os.path.join(OUT, "unet_final")

T_STARS = (25, 50, 100)
EPS = 2000
ITERS = 100


def main():
    import jax
    import jax.numpy as jnp

    from diffusion_model_for_audio_defense_tpu.core.checkpoint import load_pytree
    from diffusion_model_for_audio_defense_tpu.core.functional import (
        enable_compilation_cache,
        jit_hoisted,
    )
    from diffusion_model_for_audio_defense_tpu.data.synth_speech import labeled_batch
    from diffusion_model_for_audio_defense_tpu.models import create_model
    from diffusion_model_for_audio_defense_tpu.models.unet import (
        create_unet,
        infer_unet_kwargs,
    )
    from diffusion_model_for_audio_defense_tpu.ops import Wave2Spect
    from diffusion_model_for_audio_defense_tpu.purify.diffusion_math import (
        create_gaussian_diffusion,
    )
    from diffusion_model_for_audio_defense_tpu.purify.spec import (
        melspec_inv_standardize,
        melspec_standardize,
    )

    enable_compilation_cache()
    unet_vars = load_pytree(UNET_FINAL)
    unet = create_unet(**infer_unet_kwargs(unet_vars))
    d = create_gaussian_diffusion(steps=200)
    model_fn = lambda xx, tt: unet.apply(unet_vars, xx, tt)
    clf = create_model("resnext29_8_64", num_classes=10, in_channels=1)
    clf_state = load_pytree(CLF_EVAL)
    clf_vars = {"params": clf_state["params"], "batch_stats": clf_state["batch_stats"]}
    w2s = Wave2Spect(n_mels=32)
    clf_fn = jit_hoisted(lambda s: clf.apply(clf_vars, s))

    rng = np.random.default_rng(77)
    x, y = labeled_batch(rng, 100)
    spec = w2s(jnp.asarray(x))

    def acc(sb):
        return float(np.mean(np.argmax(np.asarray(clf_fn(sb)), -1) == y))

    denoise = {}
    key = jax.random.PRNGKey(0)
    for t_star in T_STARS:
        key, k1, k2 = jax.random.split(key, 3)

        def noisy_and_denoised(spec, k1, k2, t_star=t_star):
            std = melspec_standardize(spec)
            bsz = std.shape[0]
            noise = jax.random.normal(k1, std.shape, dtype=std.dtype)
            x_t = d.q_sample(std, jnp.full((bsz,), t_star - 1), noise)
            den = d.p_sample_loop(model_fn, rng=k2, x_t=x_t, t_start=t_star)
            return melspec_inv_standardize(x_t), melspec_inv_standardize(den)

        noisy, den = jit_hoisted(noisy_and_denoised)(spec, k1, k2)
        denoise[f"t_star={t_star}"] = {
            "clean_acc": acc(spec), "noisy_acc": acc(noisy), "denoised_acc": acc(den),
        }
        print(f"t*={t_star}: {denoise[f't_star={t_star}']}")

    from diffusion_model_for_audio_defense_tpu.cli import adaptive_attack_eval

    common = ["--data_path", TEST_DIR, "--classifier_model", "resnext29_8_64",
              "--classifier_path", CLF_EVAL, "--attack", "CW",
              "--bound_norm", "linf", "--eps", str(EPS),
              "--max_iter_1", str(ITERS), "--batch_size", "25",
              "--num_per_class", "5", "--seed", "0"]
    print(f"=== strong spec attack (eps={EPS}, iters={ITERS}): undefended ===")
    res_none = adaptive_attack_eval.main(common + ["--defense", "None"])
    print(f"=== strong spec attack (eps={EPS}, iters={ITERS}): Diffusion-Spec t*=3 ===")
    res_spec = adaptive_attack_eval.main(
        common + ["--defense", "Diffusion-Spec", "--t", "3",
                  "--ddpm_path", UNET_FINAL])

    rec = {"denoise_sanity_strong": denoise,
           "attack": {"eps_int16": EPS, "eps_float": EPS / 32768.0,
                      "max_iter_1": ITERS, "undefended": res_none,
                      "defended_diffusion_spec_t3": res_spec}}
    with open(os.path.join(OUT, "spec_strong.json"), "w") as f:
        json.dump(rec, f, indent=2)

    spath = os.path.join(OUT, "summary.json")
    if os.path.exists(spath):
        with open(spath) as f:
            summary = json.load(f)
        summary["strong_addendum"] = rec
        with open(spath, "w") as f:
            json.dump(summary, f, indent=2)
    print(json.dumps(rec, indent=2))


if __name__ == "__main__":
    main()
