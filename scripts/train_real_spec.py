"""Train a REAL spectrogram (Improved-Diffusion UNet) purifier and evaluate it.

Spec-domain counterpart of ``train_real_diffwave.py`` (VERDICT r3 #3): the
lab13/15 throughput numbers (35.5 ms UNet fwd, 1547 utt/s purify) previously
had no weights-that-denoise witness. Stages:

  data        synthetic SC09-layout wav train/test dirs (data/synth_speech.py)
  unet        train the reference-recipe UNet (128ch/3RB, dropout 0.3,
              T=200 linear) via cli/spectrogram_train.py on mel-32 batches
  classifier  train ResNeXt29 8×64 on mel-32 of the synthetic stream
  eval        (a) spec denoise sanity: acc(clean)/acc(noisy)/acc(denoised)
              (b) cli/adaptive_attack_eval.py CW: undefended vs Diffusion-Spec

→ artifacts/real_spec/{summary.json, ckpts/, loss curve}

Reference: Improved_Diffusion_Unconditional/spectrogram_train.py:18-59,
improved_diffusion_sde.py:173-221, adaptive_attack_eval.py:244-363.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
TEST_DIR = os.path.join(REPO, "artifacts", "real_diffwave", "synth_sc09_test")

# exact reference recipe (script_util.py:11-35, spect_train_mpi_run.sh):
# 128ch/3RB UNet, dropout 0.3, T=200 linear. Reduced presets flow through
# the SAME CLI seams — the attack CLI rebuilds the UNet geometry from the
# checkpoint itself (models.unet.infer_unet_kwargs).
PRESETS = {
    # production: the exact reference recipe, needs the TPU. Round-5 fixes
    # vs the failed r4 artifact (VERDICT r4 weak #1): (a) standardize bounds
    # derived from the actual corpus (--mel_bounds auto; the synthetic mel
    # occupied only a 0.2-sigma sub-interval of [-1,1] under the reference
    # SC09 bounds, so training and purification both ran off-distribution);
    # (b) 4x the training budget (8k -> 30k steps; reference ckpt is 84k at
    # bs 230 — spect_train_mpi_run.sh); (c) a t* sweep to pick the operating
    # point; (d) a strong-attack row that actually breaks the undefended model.
    "prod": dict(out="real_spec", unet={}, unet_steps=30000, unet_batch=128,
                 n_train_per_class=200, clf_epochs=20, clf_bpe=20, clf_batch=64,
                 # t* sweep trimmed (2,3,5,10,25)->(3,5,10) late in round 5: the
                 # deadline left ~22 min for the whole eval stage and each t*
                 # costs a cold p_sample_loop compile; small t* is where a
                 # purifier shows margin first
                 attack_iters=30, eval_n=100, t_stars=(3, 5, 10), num_per_class=5,
                 assert_acc=True, mel_bounds="auto", strong_eps=2000, strong_iters=100),
    # single-host-core-feasible reduction (nproc=1 here): a real-weights
    # hedge artifact for when the TPU tunnel is down
    "cpu": dict(out="real_spec_cpu", unet={"num_channels": 32, "num_res_blocks": 1},
                unet_steps=400, unet_batch=8,
                n_train_per_class=80, clf_epochs=6, clf_bpe=6, clf_batch=24,
                attack_iters=10, eval_n=50, t_stars=(3, 10), num_per_class=2,
                assert_acc=True, mel_bounds="auto", strong_eps=2000, strong_iters=20),
    # minutes-scale end-to-end pipeline validation (artifact is meaningless)
    "smoke": dict(out="real_spec_smoke", unet={"num_channels": 32, "num_res_blocks": 1},
                  unet_steps=6, unet_batch=8,
                  n_train_per_class=8, clf_epochs=2, clf_bpe=4, clf_batch=16,
                  attack_iters=2, eval_n=20, t_stars=(3,), num_per_class=1,
                  assert_acc=False, mel_bounds="auto", strong_eps=None, strong_iters=0),
}
CFG = PRESETS["prod"]
UNET_ARGS = ["--diffusion_steps", "200", "--lr", "1e-4"]
TASK_DESC = "synth_speech v2 (hardened: f0 overlap, distractor stacks, 10-25dB SNR noise)"

OUT = TRAIN_DIR = CKPT_DIR = CLF_DIR = CLF_EVAL = UNET_FINAL = None


def _set_out(out_name: str):
    """Re-root every stage path (each preset writes its own artifact dir)."""
    global OUT, TRAIN_DIR, CKPT_DIR, CLF_DIR, CLF_EVAL, UNET_FINAL
    OUT = os.path.join(REPO, "artifacts", out_name)
    TRAIN_DIR = os.path.join(OUT, "synth_sc09_train")
    CKPT_DIR = os.path.join(OUT, "ckpts")
    CLF_DIR = os.path.join(OUT, "classifier")
    CLF_EVAL = os.path.join(OUT, "resnext_synth_eval")
    UNET_FINAL = os.path.join(OUT, "unet_final")


_set_out(CFG["out"])


def stage_data(n_train_per_class: int = 200):
    import shutil

    from diffusion_model_for_audio_defense_tpu.data.synth_speech import write_dataset

    # always regenerate (stale sets from an older task version must never
    # leak into a fresh artifact — task v2 replaced v1 in round 5)
    for d in (TRAIN_DIR, TEST_DIR):
        if os.path.isdir(d):
            shutil.rmtree(d)
    write_dataset(TRAIN_DIR, n_per_class=n_train_per_class, seed=11)
    print("train wavs ->", TRAIN_DIR)
    write_dataset(TEST_DIR, n_per_class=10, seed=1234)
    print("test wavs ->", TEST_DIR)


def stage_unet(steps: int = 8000, batch: int = 128, resume: bool = False):
    import shutil

    from diffusion_model_for_audio_defense_tpu.cli import spectrogram_train

    # fresh run: TrainLoop auto-resumes from save_dir, and checkpoints from
    # an older task version / standardize bounds must not leak in. --resume
    # keeps them (axon-wedge recovery for a same-config run).
    if os.path.isdir(CKPT_DIR) and not resume:
        shutil.rmtree(CKPT_DIR)
    spectrogram_train.main([
        "--data_dir", TRAIN_DIR, "--batch_size", str(batch), "--max_steps", str(steps),
        "--save_interval", str(min(1000, steps)), "--save_dir", CKPT_DIR, *UNET_ARGS,
        "--mel_bounds", CFG.get("mel_bounds", "ref"),
        *sum((["--" + k, str(v)] for k, v in CFG["unet"].items()), []),
    ])
    # the freshest EMA sweep is the eval checkpoint (reference uses the EMA
    # weights for sampling, train_util.py ema_rate=0.9999)
    emas = sorted(d for d in os.listdir(CKPT_DIR) if d.startswith("ema_"))
    assert emas, f"no EMA checkpoints in {CKPT_DIR}"
    src = os.path.join(CKPT_DIR, emas[-1])
    from diffusion_model_for_audio_defense_tpu.core.checkpoint import load_pytree, save_pytree
    from diffusion_model_for_audio_defense_tpu.purify.spec import (
        REF_MEL_BOUNDS,
        load_mel_bounds,
        save_mel_bounds,
    )

    save_pytree(UNET_FINAL, load_pytree(src))
    # the standardize bounds travel with the exported checkpoint (sidecar)
    bounds = load_mel_bounds(src)
    if tuple(bounds) != REF_MEL_BOUNDS:
        save_mel_bounds(UNET_FINAL, bounds)
        print(f"unet: mel bounds sidecar {bounds} -> {UNET_FINAL}.mel_bounds.json")
    print(f"unet: exported {src} -> {UNET_FINAL}")


def stage_classifier(epochs: int = 20, batches_per_epoch: int = 20, batch: int = 64):
    batches_per_epoch, batch = CFG["clf_bpe"], CFG["clf_batch"]
    import jax.numpy as jnp

    from diffusion_model_for_audio_defense_tpu.core.checkpoint import load_pytree, save_pytree
    from diffusion_model_for_audio_defense_tpu.data.synth_speech import labeled_batch
    from diffusion_model_for_audio_defense_tpu.models import create_model
    from diffusion_model_for_audio_defense_tpu.ops import Wave2Spect
    from diffusion_model_for_audio_defense_tpu.train import ClassifierTrainer
    from diffusion_model_for_audio_defense_tpu.train import logger as tlog

    class StreamLoader:
        def __init__(self, seed):
            self.seed, self.epoch = seed, 0

        def set_epoch(self, e):
            self.epoch = e

        def __iter__(self):
            rng = np.random.default_rng((self.seed, self.epoch))
            for _ in range(batches_per_epoch):
                x, y = labeled_batch(rng, batch)
                yield {"samples": x[:, 0, :], "target": y}

    tlog.configure(CLF_DIR, ["csv", "stdout"])
    model = create_model("resnext29_8_64", num_classes=10, in_channels=1)
    tr = ClassifierTrainer(model, transform=Wave2Spect(n_mels=32), mode="vanilla", lr=0.02,
                           sample_input=jnp.zeros((1, 1, 16000)), save_dir=CLF_DIR)
    val = StreamLoader(seed=999)
    best_exported = -1.0
    for epoch in range(epochs):
        tr.train_epoch(StreamLoader(seed=7), epoch)
        vloss, vacc = tr.evaluate(val)
        tlog.logkv("epoch", epoch)
        tlog.logkv("valid_acc", vacc)
        tlog.dumpkvs()
        tr.maybe_checkpoint(vloss, vacc, "resnext_synth")
        # timeout insurance: keep the TRACKED eval export current after every
        # improving epoch, so a deadline kill still leaves a usable classifier
        if tr.best_acc > best_exported:
            best = load_pytree(os.path.join(CLF_DIR, "resnext_synth-best-acc"))
            save_pytree(CLF_EVAL, {"params": best["params"],
                                   "batch_stats": best["batch_stats"]})
            best_exported = tr.best_acc
    print(f"classifier: best valid acc {tr.best_acc:.4f}")
    if CFG["assert_acc"]:
        # v2 task has a ~5% Bayes floor (f0 band overlap) + distractors
        assert tr.best_acc > 0.8, "spec classifier failed to learn the synthetic task"
    best = load_pytree(os.path.join(CLF_DIR, "resnext_synth-best-acc"))
    save_pytree(CLF_EVAL, {"params": best["params"], "batch_stats": best["batch_stats"]})
    print("eval classifier ->", CLF_EVAL)


def stage_eval(attack_iters: int = 30, attack_only: bool = False):
    import jax
    import jax.numpy as jnp

    from diffusion_model_for_audio_defense_tpu.core.checkpoint import load_pytree
    from diffusion_model_for_audio_defense_tpu.core.functional import jit_hoisted
    from diffusion_model_for_audio_defense_tpu.data.synth_speech import labeled_batch
    from diffusion_model_for_audio_defense_tpu.models import create_model
    from diffusion_model_for_audio_defense_tpu.models.unet import create_unet
    from diffusion_model_for_audio_defense_tpu.ops import Wave2Spect
    from diffusion_model_for_audio_defense_tpu.purify.diffusion_math import (
        create_gaussian_diffusion,
    )
    from diffusion_model_for_audio_defense_tpu.purify.spec import (
        melspec_inv_standardize,
        melspec_standardize,
    )

    from diffusion_model_for_audio_defense_tpu.purify.spec import load_mel_bounds

    mel_bounds = load_mel_bounds(UNET_FINAL)
    unet_desc = ("128ch/3RB dropout0.3 (exact reference recipe)" if not CFG["unet"]
                 else "{num_channels}ch/{num_res_blocks}RB reduced".format(**CFG["unet"]))
    # the EXPORTED checkpoint step, not the preset target: round-5 VM resets
    # cut training at step 1000 of the 30k plan — record what actually ran
    import re

    ema_steps = [int(m.group(1)) for nm in
                 (os.listdir(CKPT_DIR) if os.path.isdir(CKPT_DIR) else ())
                 if (m := re.match(r"ema_[0-9.]+_(\d+)$", nm))]
    summary = {"config": {"unet": unet_desc,
                          "classifier": "resnext29_8_64 on mel32",
                          "schedule": "linear T=200",
                          "unet_steps_target": CFG["unet_steps"],
                          "unet_steps_trained": max(ema_steps) if ema_steps
                          else CFG["unet_steps"],
                          "mel_bounds": list(mel_bounds),
                          "task": TASK_DESC}}
    unet_vars = load_pytree(UNET_FINAL)
    # geometry from the checkpoint itself, same seam the attack CLI uses
    from diffusion_model_for_audio_defense_tpu.models.unet import infer_unet_kwargs

    unet = create_unet(**infer_unet_kwargs(unet_vars))
    d = create_gaussian_diffusion(steps=200)
    model_fn = lambda xx, tt: unet.apply(unet_vars, xx, tt)
    clf = create_model("resnext29_8_64", num_classes=10, in_channels=1)
    clf_state = load_pytree(CLF_EVAL)
    clf_vars = {"params": clf_state["params"], "batch_stats": clf_state["batch_stats"]}
    w2s = Wave2Spect(n_mels=32)
    clf_fn = jit_hoisted(lambda s: clf.apply(clf_vars, s))

    # ---- (a) spec denoise sanity: q-sample noise at t*, ancestral reverse --
    rng = np.random.default_rng(77)
    x, y = labeled_batch(rng, CFG["eval_n"])
    spec = w2s(jnp.asarray(x))

    def acc(sb):
        return float(np.mean(np.argmax(np.asarray(clf_fn(sb)), -1) == y))

    # deadline-kill insurance: persist the summary after every completed
    # sub-result (t* row / attack block) so a timeout loses one row, not all
    def _dump():
        with open(os.path.join(OUT, "summary.json"), "w") as f:
            json.dump(summary, f, indent=2)

    # --attack_only: the denoise-sanity sweep already ran (and was committed
    # incrementally) in a previous process; each t* row costs a cold
    # p_sample_loop compile on the tunnel, so reuse the committed rows and
    # jump straight to the attack blocks (round-5 recovery after the eval
    # process died at the defended-attack compile).
    prior = {}
    if attack_only:
        spath = os.path.join(OUT, "summary.json")
        if os.path.isfile(spath):
            with open(spath) as f:
                prior = json.load(f)
    if attack_only and "denoise_sanity" in prior:
        summary.update({k: v for k, v in prior.items() if k != "config"})

    denoise = {}
    key = jax.random.PRNGKey(0)
    for t_star in () if attack_only and "denoise_sanity" in prior else CFG["t_stars"]:
        key, k1, k2 = jax.random.split(key, 3)

        def noisy_and_denoised(spec, k1, k2, t_star=t_star):
            std = melspec_standardize(spec, mel_bounds)
            bsz = std.shape[0]
            noise = jax.random.normal(k1, std.shape, dtype=std.dtype)
            x_t = d.q_sample(std, jnp.full((bsz,), t_star - 1), noise)
            den = d.p_sample_loop(model_fn, rng=k2, x_t=x_t, t_start=t_star)
            return melspec_inv_standardize(x_t, mel_bounds), melspec_inv_standardize(den, mel_bounds)

        noisy, den = jit_hoisted(noisy_and_denoised)(spec, k1, k2)
        denoise[f"t_star={t_star}"] = {
            "clean_acc": acc(spec), "noisy_acc": acc(noisy), "denoised_acc": acc(den),
        }
        print(f"t*={t_star}: {denoise[f't_star={t_star}']}")
        summary["denoise_sanity"] = denoise
        _dump()
    if denoise:
        summary["denoise_sanity"] = denoise
    else:
        denoise = summary["denoise_sanity"]

    # operating point for the attack rows: the t* with the best noise
    # recovery (denoised - noisy), preferring larger recovery margins
    def _margin(ts):
        r = denoise[f"t_star={ts}"]
        return r["denoised_acc"] - r["noisy_acc"]

    attack_t = max(CFG["t_stars"], key=_margin)
    summary["attack_t_star"] = {"chosen": int(attack_t), "by": "max denoised-noisy margin"}
    print(f"attack t* = {attack_t} (margin {_margin(attack_t):+.3f})")

    # ---- (b) adaptive CW attack: undefended vs Diffusion-Spec -------------
    from diffusion_model_for_audio_defense_tpu.cli import adaptive_attack_eval

    def run_cw(eps: int, iters: int):
        common = ["--data_path", TEST_DIR, "--classifier_model", "resnext29_8_64",
                  "--classifier_path", CLF_EVAL, "--attack", "CW",
                  "--bound_norm", "linf", "--eps", str(eps),
                  "--max_iter_1", str(iters), "--batch_size", "25",
                  "--num_per_class", str(CFG["num_per_class"]), "--seed", "0"]
        print(f"\n=== attack eps={eps} iters={iters}: undefended ===")
        res_none = adaptive_attack_eval.main(common + ["--defense", "None"])
        print(f"\n=== attack eps={eps} iters={iters}: Diffusion-Spec (t*={attack_t}) ===")
        # --no_pallas_attention: the attack differentiates the purifier, and
        # the attention VJP recomputes via einsum anyway; keeping the graph
        # pallas-free lets jit_hoisted hoist the UNet params (the pallas
        # fallback baked ~570 MB of HLO and 413'd the compile tunnel)
        res_spec = adaptive_attack_eval.main(
            common + ["--defense", "Diffusion-Spec", "--t", str(attack_t),
                      "--ddpm_path", UNET_FINAL, "--no_pallas_attention"])
        rec = {"eps_int16": eps, "eps_float": eps / 32768.0, "max_iter_1": iters,
               "undefended": res_none,
               f"defended_diffusion_spec_t{attack_t}": res_spec}
        if res_none["robust_acc"] >= 0.95:
            rec["note"] = "budget too small for this task: attack breaks (almost) nothing undefended"
        return rec

    _dump()
    # strong row first: it is the headline (defended-vs-undefended delta);
    # a deadline kill should cost the eps65 row, not this one
    if CFG.get("strong_eps"):
        summary[f"attack_cw_linf_eps{CFG['strong_eps']}_strong"] = run_cw(
            CFG["strong_eps"], CFG["strong_iters"])
        _dump()
    if not (CFG.get("skip_eps65") and "attack_cw_linf_eps65" in summary):
        summary["attack_cw_linf_eps65"] = run_cw(65, attack_iters)

    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print("\nsummary ->", os.path.join(OUT, "summary.json"))
    print(json.dumps(summary, indent=2))


def main(argv=None):
    global CFG
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stage", choices=["all", "data", "unet", "classifier", "eval"],
                    default="all")
    ap.add_argument("--preset", choices=sorted(PRESETS), default="prod")
    ap.add_argument("--unet_steps", type=int, default=None)
    ap.add_argument("--unet_batch", type=int, default=None)
    ap.add_argument("--clf_epochs", type=int, default=None)
    ap.add_argument("--attack_iters", type=int, default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (axon pins JAX_PLATFORMS; "
                         "jax.config still works — CLAUDE.md)")
    ap.add_argument("--smoke", action="store_true", help="alias for --preset smoke")
    ap.add_argument("--resume", action="store_true",
                    help="keep existing UNet checkpoints and resume training "
                         "(wedge recovery); default wipes them for a fresh run")
    ap.add_argument("--attack_only", action="store_true",
                    help="eval stage: reuse the committed denoise-sanity rows "
                         "in summary.json and run only the attack blocks")
    ap.add_argument("--strong_eps", type=int, default=None,
                    help="override the strong-row eps (int16 units); with "
                         "--attack_only this ADDs an attack_cw_linf_eps<N>_strong "
                         "row — eps65 broke nothing and eps2000 broke everything "
                         "on the v2 task, the informative budget is between")
    ap.add_argument("--strong_iters", type=int, default=None)
    ap.add_argument("--skip_eps65", action="store_true",
                    help="eval stage: keep an existing eps65 row instead of "
                         "rerunning it (attack_only eps sweeps)")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.smoke:
        args.preset = "smoke"
    CFG = dict(PRESETS[args.preset])
    for k in ("unet_steps", "unet_batch", "clf_epochs", "attack_iters",
              "strong_eps", "strong_iters"):
        if getattr(args, k) is not None:
            CFG[k] = getattr(args, k)
    CFG["skip_eps65"] = args.skip_eps65
    _set_out(CFG["out"])

    from diffusion_model_for_audio_defense_tpu.core.functional import enable_compilation_cache

    enable_compilation_cache()
    os.makedirs(OUT, exist_ok=True)
    if args.stage in ("all", "data"):
        stage_data(n_train_per_class=CFG["n_train_per_class"])
    if args.stage in ("all", "unet"):
        stage_unet(steps=CFG["unet_steps"], batch=CFG["unet_batch"], resume=args.resume)
    if args.stage in ("all", "classifier"):
        stage_classifier(epochs=CFG["clf_epochs"])
    if args.stage in ("all", "eval"):
        stage_eval(attack_iters=CFG["attack_iters"], attack_only=args.attack_only)


if __name__ == "__main__":
    main()
