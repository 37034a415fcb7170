"""Flagship-configuration artifact: DiffWave purifier + mel + ResNeXt29 8x64.

The reference's primary defended system is DiffWave -> MelSpectrogram ->
ResNeXt29 (adaptive_attack_eval.py:76-99,170-172) — the exact stack
``__graft_entry__.entry()`` compiles — but the round-4 trained-weights
defense artifact used M5 as the victim (VERDICT r4 missing #3). This script
composes the TRAINED DiffWave (artifacts/real_diffwave/diffwave_final) with
the TRAINED ResNeXt (artifacts/real_spec/resnext_synth_eval) and produces
the same sections as real_diffwave/summary.json:

  (a) denoise sanity at sigma in {0.25, 0.5, 1.0} (one-shot, certify chain)
  (b) adaptive CW eps=65 (reference budget) and eps=2000 (strong),
      undefended vs Diffusion-defended, full gradient through the purifier
  (c) certification sigma=0.25 N=2000: diffusion denoised smoothing vs
      plain randomized smoothing

-> artifacts/real_flagship/summary.json

Run on the TPU AFTER train_real_diffwave.py and train_real_spec.py
(one axon client at a time):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/eval_flagship.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DW_DIR = os.path.join(REPO, "artifacts", "real_diffwave")
DW_FINAL = os.path.join(DW_DIR, "diffwave_final")
DW_CONFIG = os.path.join(DW_DIR, "config.json")
TEST_DIR = os.path.join(DW_DIR, "synth_sc09_test")
CLF_EVAL = os.path.join(REPO, "artifacts", "real_spec", "resnext_synth_eval")
OUT = os.path.join(REPO, "artifacts", "real_flagship")

TASK_DESC = "synth_speech v2 (hardened: f0 overlap, distractor stacks, 10-25dB SNR noise)"


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--attack_iters", type=int, default=30)
    ap.add_argument("--strong_eps", type=int, default=2000)
    ap.add_argument("--strong_iters", type=int, default=100)
    ap.add_argument("--certify_n", type=int, default=2000)
    ap.add_argument("--num_per_class", type=int, default=5)
    ap.add_argument("--skip_certify", action="store_true")
    ap.add_argument("--skip_lab23", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="reuse sections already present in summary.json "
                         "(skip their recompute; a VM reset mid-run costs "
                         "one section, not the whole artifact)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from diffusion_model_for_audio_defense_tpu.core import compute_t_star, linear_schedule
    from diffusion_model_for_audio_defense_tpu.core.checkpoint import load_pytree
    from diffusion_model_for_audio_defense_tpu.core.functional import (
        enable_compilation_cache,
        jit_hoisted,
    )
    from diffusion_model_for_audio_defense_tpu.data.synth_speech import labeled_batch
    from diffusion_model_for_audio_defense_tpu.models import create_model
    from diffusion_model_for_audio_defense_tpu.models.wavenet import wavenet_from_config
    from diffusion_model_for_audio_defense_tpu.ops import Wave2Spect
    from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_stack import (
        wavenet_apply_stack,
    )
    from diffusion_model_for_audio_defense_tpu.purify.ddpm import one_shot_denoise

    enable_compilation_cache()
    os.makedirs(OUT, exist_ok=True)
    for p in (DW_FINAL, CLF_EVAL):
        assert os.path.isdir(p), f"missing trained checkpoint: {p} (run the train pipelines first)"

    with open(DW_CONFIG) as f:
        cfg = json.load(f)
    prior = {}
    spath = os.path.join(OUT, "summary.json")
    if args.resume and os.path.isfile(spath):
        with open(spath) as f:
            prior = json.load(f)
        print(f"[resume] reusing completed sections from {spath}: "
              f"{sorted(k for k in prior if k != 'config')}")
    summary = {"config": {
        "system": "DiffWave -> MelSpectrogram(32) -> ResNeXt29 8x64 (reference flagship stack, "
                  "adaptive_attack_eval.py:76-99,170-172)",
        "wavenet": "{res_channels}ch/{num_res_layers}L cycle{dilation_cycle} bf16".format(
            **cfg["wavenet_config"]),
        "classifier_ckpt": os.path.relpath(CLF_EVAL, REPO),
        "diffwave_ckpt": os.path.relpath(DW_FINAL, REPO),
        "task": TASK_DESC,
    }}

    # deadline-kill insurance (same as train_real_spec.stage_eval): persist
    # after every completed section so a timeout loses one block, not all
    def _dump():
        with open(os.path.join(OUT, "summary.json"), "w") as f:
            json.dump(summary, f, indent=2)

    # ---- (a) denoise sanity (the certify chain's exact normalization) -----
    denoise = {}
    key = jax.random.PRNGKey(0)
    sigmas = (0.25, 0.5, 1.0)
    if all(f"sigma={s}" in prior.get("denoise_sanity", {}) for s in sigmas):
        denoise = prior["denoise_sanity"]
        summary["denoise_sanity"] = denoise
        sigmas = ()
        print("[resume] denoise_sanity complete — skipping")
    if sigmas:
        # only this section drives the models in-process (the attack/certify
        # sections go through the CLIs, which load their own) — build lazily
        # so a fully-resumed invocation never touches the checkpoints
        sched = linear_schedule(200)
        wavenet = wavenet_from_config(cfg["wavenet_config"], dtype=jnp.bfloat16)
        wn_vars = load_pytree(DW_FINAL)
        on_tpu = jax.default_backend() == "tpu"
        if on_tpu:
            eps_fn = lambda x, t: wavenet_apply_stack(
                wn_vars, x, t[:, None], num_res_layers=wavenet.num_res_layers,
                dilation_cycle=wavenet.dilation_cycle, dtype=jnp.bfloat16)
        else:
            eps_fn = lambda x, t: wavenet.apply(wn_vars, x, t[:, None])
        clf = create_model("resnext29_8_64", num_classes=10, in_channels=1)
        clf_state = load_pytree(CLF_EVAL)
        clf_vars = {"params": clf_state["params"], "batch_stats": clf_state["batch_stats"]}
        w2s = Wave2Spect(n_mels=32)
        clf_fn = jit_hoisted(lambda x: clf.apply(clf_vars, w2s(x)))

        rng = np.random.default_rng(2024)
        x, y = labeled_batch(rng, 100)
        x = jnp.asarray(x)

        def acc(xb):
            return float(np.mean(np.argmax(np.asarray(clf_fn(xb)), -1) == y))

    for sigma in sigmas:
        t_star = compute_t_star(sched, sigma)
        sas = (1.0 / (1.0 + sigma**2)) ** 0.5
        key, k = jax.random.split(key)
        noisy = x + sigma * jax.random.normal(k, x.shape)
        den_fn = jit_hoisted(lambda xn: one_shot_denoise(eps_fn, sched, sas * xn, t_star))
        denoised = den_fn(noisy)
        denoise[f"sigma={sigma}"] = {
            "t_star": int(t_star), "clean_acc": acc(x), "noisy_acc": acc(noisy),
            "denoised_acc": acc(jnp.asarray(np.asarray(denoised), jnp.float32)),
        }
        print(f"sigma={sigma}: {denoise[f'sigma={sigma}']}")
        summary["denoise_sanity"] = denoise
        _dump()

    # ---- (b) adaptive CW: undefended vs Diffusion-defended ----------------
    from diffusion_model_for_audio_defense_tpu.cli import adaptive_attack_eval

    def run_cw(skey: str, eps: int, iters: int):
        """One attack row, resumable at undefended/defended granularity.

        Each half is a full adaptive-CW compile + run; a deadline kill
        between the two must not discard the finished undefended half, so
        the row is dumped with ``"partial": true`` after it.
        """
        prec = prior.get(skey, {})
        if "defended_diffusion_t3" in prec:
            print(f"[resume] {skey} complete — skipping")
            return prec
        common = ["--data_path", TEST_DIR, "--classifier_model", "resnext29_8_64",
                  "--classifier_path", CLF_EVAL, "--attack", "CW",
                  "--bound_norm", "linf", "--eps", str(eps),
                  "--max_iter_1", str(iters), "--batch_size", "25",
                  "--num_per_class", str(args.num_per_class), "--seed", "0"]
        rec = {"eps_int16": eps, "eps_float": eps / 32768.0, "max_iter_1": iters}
        if "undefended" in prec:
            print(f"[resume] {skey}: undefended half done — skipping")
            rec["undefended"] = res_none = prec["undefended"]
        else:
            print(f"\n=== attack eps={eps} iters={iters}: undefended ===")
            rec["undefended"] = res_none = adaptive_attack_eval.main(
                common + ["--defense", "None"])
            summary[skey] = {**rec, "partial": True}
            _dump()
        print(f"\n=== attack eps={eps} iters={iters}: Diffusion (DDPM one-shot, t*=3) ===")
        rec["defended_diffusion_t3"] = adaptive_attack_eval.main(
            common + ["--defense", "Diffusion", "--diffusion_type", "ddpm",
                      "--t", "3", "--ddpm_path", DW_FINAL,
                      "--ddpm_config", DW_CONFIG, "--bf16"])
        if res_none["robust_acc"] >= 0.95:
            rec["note"] = "budget too small for this task: attack breaks (almost) nothing undefended"
        return rec

    # strong row first: it is the headline (defended-vs-undefended delta);
    # a deadline kill should cost the eps65 row, not this one
    if args.strong_eps:
        skey = f"attack_cw_linf_eps{args.strong_eps}_strong"
        summary[skey] = run_cw(skey, args.strong_eps, args.strong_iters)
        _dump()
    summary["attack_cw_linf_eps65"] = run_cw(
        "attack_cw_linf_eps65", 65, args.attack_iters)
    _dump()

    # ---- (c) certification sigma=0.25: diffusion vs randsmooth ------------
    if "certify_sigma0.25" in prior and "randsmooth_no_denoiser" in prior["certify_sigma0.25"]:
        summary["certify_sigma0.25"] = prior["certify_sigma0.25"]
        print("[resume] certify_sigma0.25 complete — skipping")
        _dump()
    elif not args.skip_certify:
        from diffusion_model_for_audio_defense_tpu.cli import certified_robustness_eval

        def certify(method, tag, extra=()):
            path = os.path.join(OUT, f"certified_{tag}.jsonl")
            if os.path.exists(path):
                os.unlink(path)
            recs = certified_robustness_eval.main([
                "--data_path", TEST_DIR, "--classifier_model", "resnext29_8_64",
                "--classifier_path", CLF_EVAL, "--defense_method", method,
                "--sigma", "0.25", "--num_sampling", str(args.certify_n), "--n0", "100",
                "--certify_batch_size", "128", "--batch_size", "25",
                "--num_per_class", str(args.num_per_class), "--save_path", path, *extra])
            radii = [r["certified_radius"] for r in recs
                     if r["y_pred"] == r["y_true"] and r["certified_radius"] > 0]
            return {"n": len(recs), "certified_correct": len(radii),
                    "mean_certified_radius": float(np.mean(radii)) if radii else 0.0,
                    "jsonl": os.path.relpath(path, REPO)}

        print("\n=== certify: diffusion denoised smoothing (sigma=0.25) ===")
        cert = {"N": args.certify_n}
        summary["certify_sigma0.25"] = cert
        cert["diffusion"] = certify("diffusion", "diffusion_sigma0.25",
                                    ("--ddpm_path", DW_FINAL, "--ddpm_config", DW_CONFIG))
        _dump()
        cert["randsmooth_no_denoiser"] = certify("randsmooth", "randsmooth_sigma0.25")
        _dump()

    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print("\nsummary ->", os.path.join(OUT, "summary.json"))
    print(json.dumps(summary, indent=2))

    # lab21 close-out (VERDICT r4 #6) piggybacks here: same process = same
    # axon client (a separate queue step would be a second client — the
    # tunnel admits one), and the UNet fwd compile is already cached.
    if jax.default_backend() == "tpu" and not args.skip_lab23:
        print("\n=== lab23: UNet HBM bytes close-out ===")
        try:
            from perf.lab23_unet_bytes_closeout import main as lab23_main

            lab23_main([])
        except Exception as e:  # the flagship artifact must not die on a perf lab
            print(f"[warn] lab23 failed: {e}")


if __name__ == "__main__":
    main()
