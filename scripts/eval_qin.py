"""Qin imperceptible-attack (stage 2) artifact on TRAINED weights.

VERDICT r4 #9: the psychoacoustic stage-2 evidence was tests-only. This
script runs the fused two-stage Qin attack (``AudioAttack`` with
``PsychoacousticMasker``, ``fused_stage_2=True`` — the whole
imperceptibility loop as ONE lax.while_loop, perf/lab17) against the
flagship system, undefended and Diffusion-defended, and reports:

- stage-1 / stage-2 success rates,
- the final perturbation's psychoacoustic hinge loss (theta loss = mean
  max(PSD(delta) - masking threshold, 0); < loss_theta_min 0.05 means the
  perturbation sits under the clean signal's masking threshold).

Budget: max_iter_1=100, max_iter_2 scaled from the reference default 4000
(white_box_attack.py:470-604) — scaling recorded in the artifact.

-> artifacts/real_qin/summary.json

Run on the TPU AFTER the train pipelines:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/eval_qin.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from types import SimpleNamespace

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DW_DIR = os.path.join(REPO, "artifacts", "real_diffwave")
DW_FINAL = os.path.join(DW_DIR, "diffwave_final")
DW_CONFIG = os.path.join(DW_DIR, "config.json")
TEST_DIR = os.path.join(DW_DIR, "synth_sc09_test")
CLF_EVAL = os.path.join(REPO, "artifacts", "real_spec", "resnext_synth_eval")
OUT = os.path.join(REPO, "artifacts", "real_qin")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--eps", type=int, default=2000)
    ap.add_argument("--max_iter_1", type=int, default=60)
    ap.add_argument("--max_iter_2", type=int, default=300)
    ap.add_argument("--n_utts", type=int, default=8)
    ap.add_argument("--fused", type=int, default=1)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from diffusion_model_for_audio_defense_tpu.attacks import (
        AudioAttack,
        PsychoacousticMasker,
    )
    from diffusion_model_for_audio_defense_tpu.cli._common import (
        build_classifier,
        build_defender,
    )
    from diffusion_model_for_audio_defense_tpu.core.functional import (
        enable_compilation_cache,
        jit_hoisted,
    )
    from diffusion_model_for_audio_defense_tpu.data import DataLoader, SC09Dataset
    from diffusion_model_for_audio_defense_tpu.ops import Wave2Spect
    from diffusion_model_for_audio_defense_tpu.system import AcousticSystem
    from diffusion_model_for_audio_defense_tpu.transforms import (
        Compose,
        FixAudioLength,
        LoadAudio,
    )

    enable_compilation_cache()
    os.makedirs(OUT, exist_ok=True)

    ds = SC09Dataset(folder=TEST_DIR, transform=Compose([LoadAudio(), FixAudioLength()]),
                     num_per_class=1)
    batch = next(iter(DataLoader(ds, batch_size=args.n_utts, shuffle=False)))
    x = jnp.asarray(batch["samples"])[:, None, :]
    y = jnp.asarray(np.asarray(batch["target"]))

    summary = {"config": {
        "system": "DiffWave -> mel32 -> ResNeXt29 8x64 (flagship), trained weights",
        "attack": "Qin two-stage (CW stage 1 + psychoacoustic stage 2), fused device loops",
        "eps_int16": args.eps, "max_iter_1": args.max_iter_1, "max_iter_2": args.max_iter_2,
        "budget_note": f"max_iter_2={args.max_iter_2} scaled from the reference default 4000 "
                       "(white_box_attack.py:470-604)",
        "loss_theta_min": 0.05,
        "match": "reference robustness_eval/white_box_attack.py:344-604",
    }}

    def run(defended: bool):
        ns = SimpleNamespace(
            classifier_model="resnext29_8_64", classifier_path=CLF_EVAL,
            classifier_type="vanilla",
            defense="Diffusion" if defended else "None",
            diffusion_type="ddpm", t=3, sample_step=1, rand_t=False, t_delta=15,
            ddpm_path=DW_FINAL, ddpm_config=DW_CONFIG, bf16=True,
        )
        _, _, clf_apply = build_classifier(ns)
        defender, dtype_, stoch = build_defender(ns)
        system = AcousticSystem(clf_apply, Wave2Spect(n_mels=32), defender, dtype_,
                                defender_stochastic=stoch)
        attacker = AudioAttack(
            lambda xx, rng: system(xx, rng, defend=True),
            masker=PsychoacousticMasker(),
            eps=args.eps, norm="linf", learning_rate_1=args.eps / 5,
            max_iter_1=args.max_iter_1, max_iter_2=args.max_iter_2,
            verbose=0, fused_stage_1=bool(args.fused), fused_stage_2=bool(args.fused),
        )
        adv, (s1, s2) = attacker.generate(x, y, targeted=False, rng=jax.random.PRNGKey(0))

        # final theta loss of the returned perturbation (same mt/pm prep as
        # stage_2, attacks/pgd.py:352-367)
        delta = np.asarray(adv, np.float32) - np.asarray(x, np.float32)
        ths, pms = [], []
        for xi in np.asarray(x)[:, 0, :]:
            th, pm = attacker.masker.calculate_threshold_and_psd_maximum(xi)
            ths.append(th)
            pms.append(pm)
        mt_stab = jnp.asarray(10.0 ** (np.asarray(ths) * 0.1), jnp.float32)
        pm_stab = jnp.asarray(10.0 ** (np.asarray(pms) * 0.1), jnp.float32)
        theta = np.asarray(jit_hoisted(
            lambda d: attacker._psd_loss(d, mt_stab, pm_stab))(jnp.asarray(delta)))

        s1 = np.asarray(s1, bool)
        s2 = np.asarray(s2, bool)
        arm = {
            "n": int(len(y)),
            "stage1_success_rate": float(s1.mean()),
            "stage2_success_rate": float(s2.mean()),
            "robust_acc": float(1.0 - s2.mean()),
            "final_theta_loss": {
                "mean": float(theta.mean()), "max": float(theta.max()),
                "frac_under_theta_min": float((theta < 0.05).mean()),
                "per_sample": [float(v) for v in theta],
            },
        }
        print(("defended" if defended else "undefended"), json.dumps(arm, indent=2))
        return arm

    print("=== Qin two-stage: undefended ===")
    summary["undefended"] = run(False)
    spath = os.path.join(OUT, "summary.json")
    with open(spath, "w") as f:
        json.dump(summary, f, indent=2)
    print("=== Qin two-stage: defended (Diffusion t*=3) ===")
    summary["defended_diffusion_t3"] = run(True)
    with open(spath, "w") as f:
        json.dump(summary, f, indent=2)
    print("\nsummary ->", spath)


if __name__ == "__main__":
    main()
