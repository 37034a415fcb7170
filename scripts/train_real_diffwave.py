"""Train a REAL DiffWave purifier + classifier and show the defense defends.

The reference ships no DiffWave weights (its ``diffwave_ddpm.py:395-411``
loads a private 1M-iter checkpoint), so every purify/attack/certify number
in this repo previously ran on random weights (VERDICT r3 #2). This script
produces the first end-to-end "defense actually defends" artifact:

  stage data        synthesize the SC09-layout test set (data/synth_speech.py)
  stage classifier  train M5 (raw-waveform CNN) on the synthetic stream
  stage diffwave    train a WaveNet ε-net with DiffWaveTrainer (the Pallas
                    fused train step when on TPU with a %128-channel config)
  stage eval        (a) denoise sanity: acc(clean) / acc(noisy) / acc(denoised)
                    (b) cli/adaptive_attack_eval.py CW, defended vs undefended
                    (c) cli/certified_robustness_eval.py σ=0.25, diffusion vs
                        plain randsmooth
  → artifacts/real_diffwave/summary.json + checkpoints + loss curve

Model size is configurable so the same pipeline runs as the production
256ch/36L TPU artifact or a reduced CPU-feasible config (``--preset``):
the reduced WaveNet goes through the identical CLI seams via a generated
reference-format config.json (``--ddpm_config``).

Run on the TPU (one axon client at a time):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/train_real_diffwave.py --stage all

Mirrors the reference recipe: DiffWave_Unconditional/train.py (Adam 2e-4,
T=200 linear β∈[1e-4, 0.02]) + adaptive_attack_eval.py:244-363 +
certified_robustness_eval.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PRESETS = {
    # production: the exact model bench.py certifies (256ch/36L bf16)
    "prod": dict(res_channels=256, num_res_layers=36, dilation_cycle=12,
                 dtype="bf16", diffwave_iters=20000, batch=16,
                 clf_epochs=25, attack_iters=30, certify_n=2000,
                 certify_batch=128, num_per_class=5, out="real_diffwave",
                 strong_eps=2000, strong_iters=100),
    # single-host-core-feasible reduction (measured ~6-12 s/step at this
    # size; nproc=1 here) — a hedge artifact for when the TPU tunnel is
    # down; same four-stage recipe end to end
    "cpu": dict(res_channels=32, num_res_layers=8, dilation_cycle=4,
                dtype="f32", diffwave_iters=600, batch=8,
                clf_epochs=12, attack_iters=15, certify_n=300,
                certify_batch=64, num_per_class=3, out="real_diffwave_cpu",
                strong_eps=2000, strong_iters=30),
    # minutes-scale end-to-end pipeline validation (artifact is meaningless)
    "smoke": dict(res_channels=32, num_res_layers=4, dilation_cycle=2,
                  dtype="f32", diffwave_iters=30, batch=4,
                  clf_epochs=2, attack_iters=2, certify_n=64,
                  certify_batch=32, num_per_class=1, out="real_diffwave_smoke",
                  strong_eps=None, strong_iters=0),
}

# data/synth_speech.py v2 (round 5): f0 band overlap + distractor stacks +
# random-SNR noise — clean acc lands ~0.90-0.95 so reference-budget attacks
# discriminate (VERDICT r4 weak #2)
TASK_DESC = "synth_speech v2 (hardened: f0 overlap, distractor stacks, 10-25dB SNR noise)"


class Paths:
    def __init__(self, out_name: str):
        self.OUT = os.path.join(REPO, "artifacts", out_name)
        self.TEST_DIR = os.path.join(REPO, "artifacts", "real_diffwave", "synth_sc09_test")
        self.CLF_DIR = os.path.join(self.OUT, "classifier")
        self.CLF_CKPT = os.path.join(self.CLF_DIR, "m5_synth-best-acc")
        self.CLF_EVAL = os.path.join(self.OUT, "m5_synth_eval")
        self.DW_DIR = os.path.join(self.OUT, "diffwave_ckpts")
        self.DW_FINAL = os.path.join(self.OUT, "diffwave_final")
        self.CONFIG = os.path.join(self.OUT, "config.json")


def _dtype(cfg):
    import jax.numpy as jnp

    return jnp.bfloat16 if cfg["dtype"] == "bf16" else None


def _build_wavenet(cfg):
    from diffusion_model_for_audio_defense_tpu.models import WaveNet

    return WaveNet(res_channels=cfg["res_channels"], skip_channels=cfg["res_channels"],
                   num_res_layers=cfg["num_res_layers"], dilation_cycle=cfg["dilation_cycle"],
                   dtype=_dtype(cfg))


def _pallas_ok(cfg) -> bool:
    import jax

    return jax.default_backend() != "cpu" and cfg["res_channels"] % 128 == 0


def make_eps_fn(cfg, wavenet, wn_vars, *, interpret: bool = False):
    """ε-net callable for the eval stage.

    On TPU with a %128-channel config this is the fused Pallas stack (the
    production certify path); otherwise the XLA ``WaveNet.apply``. Extracted
    from ``stage_eval`` so tests can exercise the exact prod wiring with
    ``interpret=True`` on CPU — the cpu/smoke presets never take the Pallas
    branch, and a wiring bug here would otherwise surface hours into the
    prod TPU run.
    """
    import jax.numpy as jnp

    if interpret or _pallas_ok(cfg):
        from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_stack import (
            wavenet_apply_stack,
        )

        dtype = jnp.bfloat16 if cfg["dtype"] == "bf16" else jnp.float32
        return lambda x, t: wavenet_apply_stack(
            wn_vars, x, t[:, None], num_res_layers=wavenet.num_res_layers,
            dilation_cycle=wavenet.dilation_cycle, dtype=dtype, interpret=interpret)
    return lambda x, t: wavenet.apply(wn_vars, x, t[:, None])


def _write_config(cfg, P: Paths):
    """Reference-format config.json (DiffWave_Unconditional/config.json keys)
    so the eval CLIs (--ddpm_config) build the identical reduced WaveNet."""
    ref = {
        "wavenet_config": {
            "in_channels": 1, "out_channels": 1,
            "res_channels": cfg["res_channels"], "skip_channels": cfg["res_channels"],
            "num_res_layers": cfg["num_res_layers"], "dilation_cycle": cfg["dilation_cycle"],
            "diffusion_step_embed_dim_in": 128, "diffusion_step_embed_dim_mid": 512,
            "diffusion_step_embed_dim_out": 512,
        },
        "diffusion_config": {"T": 200, "beta_0": 1e-4, "beta_T": 0.02},
    }
    os.makedirs(P.OUT, exist_ok=True)
    with open(P.CONFIG, "w") as f:
        json.dump(ref, f, indent=2)
    return P.CONFIG


def stage_data(P: Paths):
    import shutil

    from diffusion_model_for_audio_defense_tpu.data.synth_speech import write_dataset

    # always regenerate: the generator is deterministic in (seed, version),
    # and a stale on-disk set from an older task version must never leak
    # into a fresh artifact (task v2 replaced v1 in round 5)
    if os.path.isdir(P.TEST_DIR):
        shutil.rmtree(P.TEST_DIR)
    write_dataset(P.TEST_DIR, n_per_class=10, seed=1234)
    print("test set ->", P.TEST_DIR)


def stage_classifier(cfg, P: Paths, batches_per_epoch: int = 20, batch: int = 64):
    import jax.numpy as jnp

    from diffusion_model_for_audio_defense_tpu.data.synth_speech import labeled_batch
    from diffusion_model_for_audio_defense_tpu.models import create_model
    from diffusion_model_for_audio_defense_tpu.train import ClassifierTrainer
    from diffusion_model_for_audio_defense_tpu.train import logger as tlog

    epochs = cfg["clf_epochs"]

    class StreamLoader:
        """Fresh synthetic batches every epoch (infinite data ⇒ no overfit)."""

        def __init__(self, seed):
            self.seed = seed
            self.epoch = 0

        def set_epoch(self, e):
            self.epoch = e

        def __iter__(self):
            rng = np.random.default_rng((self.seed, self.epoch))
            for _ in range(batches_per_epoch):
                x, y = labeled_batch(rng, batch)
                yield {"samples": x[:, 0, :], "target": y}

    tlog.configure(P.CLF_DIR, ["csv", "stdout"])
    model = create_model("m5", num_classes=10, in_channels=1)
    tr = ClassifierTrainer(model, transform=None, mode="vanilla", lr=0.02,
                           sample_input=jnp.zeros((1, 1, 16000)), save_dir=P.CLF_DIR)
    val = StreamLoader(seed=999)
    for epoch in range(epochs):
        loss, acc = tr.train_epoch(StreamLoader(seed=7), epoch)
        vloss, vacc = tr.evaluate(val)
        tlog.logkv("epoch", epoch)
        tlog.logkv("valid_acc", vacc)
        tlog.dumpkvs()
        tr.maybe_checkpoint(vloss, vacc, "m5_synth")
    print(f"classifier: best valid acc {tr.best_acc:.4f} -> {P.CLF_CKPT}")
    if cfg["out"] != PRESETS["smoke"]["out"]:
        # v2 task has a ~5% Bayes floor (f0 band overlap) + distractors;
        # a learned classifier lands ~0.85-0.95
        assert tr.best_acc > 0.8, "classifier failed to learn the synthetic task"
    # params+stats-only export for the CLIs (the best-acc ckpt carries the
    # optimizer state too)
    from diffusion_model_for_audio_defense_tpu.core.checkpoint import (
        load_pytree,
        save_pytree,
    )

    best = load_pytree(P.CLF_CKPT)
    save_pytree(P.CLF_EVAL, {"params": best["params"], "batch_stats": best["batch_stats"]})
    print("eval classifier ->", P.CLF_EVAL)


def stage_diffwave(cfg, P: Paths, resume: bool = False, iters_per_ckpt: int = 5000):
    import shutil

    # fresh run: DiffWaveTrainer auto-resumes from output_directory, and
    # checkpoints from an older task version must not leak in. --resume
    # keeps them — the recovery path after an axon-tunnel wedge kills a
    # same-config run mid-train (CLAUDE.md: wedged client = 0% CPU, sleeping).
    if os.path.isdir(P.DW_DIR) and not resume:
        shutil.rmtree(P.DW_DIR)

    from diffusion_model_for_audio_defense_tpu.core import linear_schedule
    from diffusion_model_for_audio_defense_tpu.core.checkpoint import save_pytree
    from diffusion_model_for_audio_defense_tpu.data.synth_speech import waveform_batches
    from diffusion_model_for_audio_defense_tpu.train import DiffWaveTrainer
    from diffusion_model_for_audio_defense_tpu.train import logger as tlog

    tlog.configure(P.OUT, ["csv", "stdout"])
    model = _build_wavenet(cfg)
    trainer = DiffWaveTrainer(
        model, linear_schedule(200), learning_rate=2e-4, output_directory=P.DW_DIR,
        iters_per_ckpt=iters_per_ckpt, iters_per_logging=200, use_pallas=_pallas_ok(cfg),
    )
    # DiffWaveTrainer.train's max_iters is "additional iters this call"
    # (train/diffwave.py:265); the preset value is a TOTAL budget, so pass
    # the remaining delta — a resumed-at-target run trains 0 steps and
    # just re-exports.
    trainer.train(waveform_batches(seed=0, batch_size=cfg["batch"]),
                  max_iters=max(0, cfg["diffwave_iters"] - trainer.n_iter))
    trainer.save_checkpoint()
    save_pytree(P.DW_FINAL, trainer.params)  # clean params-only ckpt for CLIs
    print(f"diffwave: {trainer.n_iter} iters -> {P.DW_FINAL}")


def _load_eval_pieces(cfg, P: Paths):
    from diffusion_model_for_audio_defense_tpu.core import linear_schedule
    from diffusion_model_for_audio_defense_tpu.core.checkpoint import load_pytree
    from diffusion_model_for_audio_defense_tpu.models import create_model

    sched = linear_schedule(200)
    wavenet = _build_wavenet(cfg)
    wn_vars = load_pytree(P.DW_FINAL)
    clf = create_model("m5", num_classes=10, in_channels=1)
    clf_state = load_pytree(P.CLF_EVAL)
    clf_vars = {"params": clf_state["params"], "batch_stats": clf_state["batch_stats"]}
    return sched, wavenet, wn_vars, clf, clf_vars


def stage_eval(cfg, P: Paths, parts=("sanity", "attack", "certify")):
    import jax
    import jax.numpy as jnp

    from diffusion_model_for_audio_defense_tpu.core import compute_t_star
    from diffusion_model_for_audio_defense_tpu.core.functional import jit_hoisted
    from diffusion_model_for_audio_defense_tpu.data.synth_speech import labeled_batch
    from diffusion_model_for_audio_defense_tpu.purify.ddpm import one_shot_denoise

    attack_iters, certify_n = cfg["attack_iters"], cfg["certify_n"]
    # parts-limited runs merge into an existing summary so sanity/attack now
    # + certify later compose into one artifact (deadline-sliced TPU queue)
    summary_path = os.path.join(P.OUT, "summary.json")
    summary = {}
    if os.path.exists(summary_path) and set(parts) != {"sanity", "attack", "certify"}:
        with open(summary_path) as f:
            summary = json.load(f)
    summary["config"] = {
        "wavenet": f"{cfg['res_channels']}ch/{cfg['num_res_layers']}L "
                   f"cycle{cfg['dilation_cycle']} {cfg['dtype']}",
        "classifier": "m5", "schedule": "linear T=200 beta 1e-4..0.02",
        "backend": jax.default_backend(), "pallas": _pallas_ok(cfg),
        "diffwave_iters": cfg["diffwave_iters"],
        "task": TASK_DESC,
    }

    sched, wavenet, wn_vars, clf, clf_vars = _load_eval_pieces(cfg, P)
    eps_fn = make_eps_fn(cfg, wavenet, wn_vars)
    clf_fn = jit_hoisted(lambda x: clf.apply(clf_vars, x))

    def _dump():
        # write after every completed section so a budget-killed run still
        # leaves the finished sections on disk
        with open(summary_path, "w") as f:
            json.dump(summary, f, indent=2)

    # ---- (a) denoise sanity: does one-shot purification recover noisy x? --
    if "sanity" in parts:
        rng = np.random.default_rng(2024)
        x, y = labeled_batch(rng, 100)
        x = jnp.asarray(x)

        def acc(xb):
            return float(np.mean(np.argmax(np.asarray(clf_fn(xb)), -1) == y))

        denoise = {}
        key = jax.random.PRNGKey(0)
        sigmas = (0.25,) if cfg["out"] == PRESETS["smoke"]["out"] else (0.1, 0.25, 0.5, 1.0)
        for sigma in sigmas:
            t_star = compute_t_star(sched, sigma)
            sas = (1.0 / (1.0 + sigma**2)) ** 0.5
            key, k = jax.random.split(key)
            noisy = x + sigma * jax.random.normal(k, x.shape)
            # the certify chain's exact normalization: scale into q(x_t|x0) then
            # one-shot denoise at t* (certify/smoothing.py)
            den_fn = jit_hoisted(lambda xn: one_shot_denoise(eps_fn, sched, sas * xn, t_star))
            denoised = den_fn(noisy)
            denoise[f"sigma={sigma}"] = {
                "t_star": int(t_star), "clean_acc": acc(x), "noisy_acc": acc(noisy),
                "denoised_acc": acc(jnp.asarray(np.asarray(denoised), jnp.float32)),
            }
            print(f"sigma={sigma}: {denoise[f'sigma={sigma}']}")
        summary["denoise_sanity"] = denoise
        _dump()

    # ---- (b) adaptive CW attack: undefended vs Diffusion-defended ---------
    from diffusion_model_for_audio_defense_tpu.cli import adaptive_attack_eval

    def run_cw(eps: int, iters: int):
        common = ["--data_path", P.TEST_DIR, "--classifier_model", "m5",
                  "--classifier_path", P.CLF_EVAL, "--attack", "CW",
                  "--bound_norm", "linf", "--eps", str(eps),
                  "--max_iter_1", str(iters), "--batch_size", "25",
                  "--num_per_class", str(cfg["num_per_class"]), "--seed", "0"]
        print(f"\n=== attack eps={eps} iters={iters}: undefended ===")
        res_none = adaptive_attack_eval.main(common + ["--defense", "None"])
        print(f"\n=== attack eps={eps} iters={iters}: Diffusion (DDPM one-shot, t*=3) ===")
        defended = common + ["--defense", "Diffusion", "--diffusion_type", "ddpm",
                             "--t", "3", "--ddpm_path", P.DW_FINAL,
                             "--ddpm_config", P.CONFIG]
        if cfg["dtype"] == "bf16":
            defended.append("--bf16")
        res_diff = adaptive_attack_eval.main(defended)
        rec = {"eps_int16": eps, "eps_float": eps / 32768.0, "max_iter_1": iters,
               "undefended": res_none, "defended_diffusion_t3": res_diff}
        # honesty label (VERDICT r4 weak #6): a row where the attack breaks
        # (almost) nothing undefended carries no defended-vs-undefended info
        if res_none["robust_acc"] >= 0.95:
            rec["note"] = "budget too small for this task: attack breaks (almost) nothing undefended"
        return rec

    if "attack" in parts:
        # reference default budget (adaptive_attack_eval.py:73-74) ...
        summary["attack_cw_linf_eps65"] = run_cw(65, attack_iters)
        _dump()
        # ... and a budget that demonstrably breaks the undefended model
        if cfg.get("strong_eps"):
            summary[f"attack_cw_linf_eps{cfg['strong_eps']}_strong"] = run_cw(
                cfg["strong_eps"], cfg["strong_iters"])
            _dump()

    # ---- (c) certification: diffusion denoised-smoothing vs randsmooth ----
    from diffusion_model_for_audio_defense_tpu.cli import certified_robustness_eval

    def certify(method, tag, extra=()):
        path = os.path.join(P.OUT, f"certified_{tag}.jsonl")
        if os.path.exists(path):
            os.unlink(path)  # fresh run, don't resume a previous config's records
        recs = certified_robustness_eval.main([
            "--data_path", P.TEST_DIR, "--classifier_model", "m5",
            "--classifier_path", P.CLF_EVAL, "--defense_method", method,
            "--sigma", "0.25", "--num_sampling", str(certify_n), "--n0", "100",
            "--certify_batch_size", str(cfg["certify_batch"]), "--batch_size", "25",
            "--num_per_class", str(cfg["num_per_class"]), "--save_path", path, *extra])
        n_cert = sum(1 for r in recs if r["y_pred"] == r["y_true"] and r["certified_radius"] > 0)
        radii = [r["certified_radius"] for r in recs
                 if r["y_pred"] == r["y_true"] and r["certified_radius"] > 0]
        return {"n": len(recs), "certified_correct": n_cert,
                "mean_certified_radius": float(np.mean(radii)) if radii else 0.0,
                "jsonl": os.path.relpath(path, REPO)}

    if "certify" in parts:
        print("\n=== certify: diffusion denoised smoothing (sigma=0.25) ===")
        summary["certify_sigma0.25"] = {
            "diffusion": certify("diffusion", "diffusion_sigma0.25",
                                 ("--ddpm_path", P.DW_FINAL, "--ddpm_config", P.CONFIG)),
            "randsmooth_no_denoiser": certify("randsmooth", "randsmooth_sigma0.25"),
            "N": certify_n,
        }

    _dump()
    print("\nsummary ->", summary_path)
    print(json.dumps(summary, indent=2))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stage", choices=["all", "data", "classifier", "diffwave", "eval"],
                    default="all")
    ap.add_argument("--preset", choices=sorted(PRESETS), default="prod")
    ap.add_argument("--diffwave_iters", type=int, default=None)
    ap.add_argument("--attack_iters", type=int, default=None)
    ap.add_argument("--certify_n", type=int, default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (axon pins JAX_PLATFORMS; this "
                         "uses jax.config, which still works — CLAUDE.md)")
    ap.add_argument("--resume", action="store_true",
                    help="keep existing diffwave checkpoints and resume training "
                         "(wedge recovery); default wipes them for a fresh run")
    ap.add_argument("--iters_per_ckpt", type=int, default=5000)
    ap.add_argument("--eval_parts", default="sanity,attack,certify",
                    help="comma-set of eval sections to run; parts-limited runs "
                         "merge into an existing summary.json (deadline slicing)")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    cfg = PRESETS[args.preset]
    for k in ("diffwave_iters", "attack_iters", "certify_n"):
        if getattr(args, k) is not None:
            cfg = {**cfg, k: getattr(args, k)}
    P = Paths(cfg["out"])

    from diffusion_model_for_audio_defense_tpu.core.functional import enable_compilation_cache

    enable_compilation_cache()
    os.makedirs(P.OUT, exist_ok=True)
    _write_config(cfg, P)
    if args.stage in ("all", "data"):
        stage_data(P)
    if args.stage in ("all", "classifier"):
        stage_classifier(cfg, P)
    if args.stage in ("all", "diffwave"):
        stage_diffwave(cfg, P, resume=args.resume, iters_per_ckpt=args.iters_per_ckpt)
    if args.stage in ("all", "eval"):
        stage_eval(cfg, P, parts=tuple(s for s in args.eval_parts.split(",") if s))


if __name__ == "__main__":
    main()
