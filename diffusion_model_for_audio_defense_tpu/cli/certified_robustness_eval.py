"""Certified robustness via randomized smoothing (denoised smoothing).

Flag-compatible rebuild of ``certified_robustness_eval.py``: loads the
(Gaussian-augmented) classifier and the DiffWave denoiser, certifies each
SC09 test utterance with N draws, and dumps per-utterance JSON records
``{id, y_true, y_pred, certified_radius}``.

TPU-first: the N=100k draw loop is the ``certify/`` shard_map kernel — the
per-(GPU, input, σ) host sharding of ``scripts/parallel_certified_robust_
eval.sh`` collapses into one sharded program. Model compute can run in bf16
(``--bf16``); counts are argmax decisions.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--data_path", default="datasets/speech_commands/test")
    p.add_argument("--classifier_model", type=str, default="resnext29_8_64")
    p.add_argument("--classifier_type", type=str, default="vanilla")
    p.add_argument("--classifier_path", type=str, default=None)
    p.add_argument("--gaussian_aug", action="store_true", default=False,
                   help="use the sigma={σ}-best-acc checkpoint naming (reference :57)")
    p.add_argument("--num_per_class", type=int, default=10)
    p.add_argument("--defense_method", type=str, choices=["diffusion", "randsmooth"], default="diffusion")
    p.add_argument("--ddpm_config", type=str, default="configs/config.json")
    p.add_argument("--ddpm_path", type=str, default=None)
    p.add_argument("--sigma", type=float, default=0.25)
    p.add_argument("--num_sampling", type=int, default=100000)
    p.add_argument("--n0", type=int, default=100)
    p.add_argument("--alpha", type=float, default=0.001)
    p.add_argument("--certify_batch_size", type=int, default=64)
    p.add_argument("--use_pallas", type=int, default=1,
                   help="fused Pallas WaveNet stack for the forward-only certify loop (TPU only)")
    p.add_argument("--batch_size", type=int, default=10)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument("--save_path", type=str, default=None)
    p.add_argument("--resume", action="store_true", default=False,
                   help="append to an existing JSONL, skipping already-certified "
                        "utterances (N=100k runs take hours; a restart should not "
                        "redo finished work). The per-batch key stream stays "
                        "aligned with the original run (same --seed), so the "
                        "remaining batches draw the keys the original run would "
                        "have used")
    p.add_argument("--gpu", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_examples", type=int, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ._common import build_classifier, load_diffwave_eps_fn
    from ..certify import RandomizedSmoothing
    from ..data import DataLoader, SC09Dataset
    from ..ops import Wave2Spect
    from ..transforms import Compose, FixAudioLength, LoadAudio

    if args.gaussian_aug and args.classifier_path is None:
        from ._common import CLASSIFIER_PATHS

        args.classifier_path = os.path.join(
            CLASSIFIER_PATHS[args.classifier_model], f"sigma={args.sigma}-best-acc.pth"
        )
    _, _, classifier_apply = build_classifier(args)

    eps_fn = schedule = None
    if args.defense_method == "diffusion":
        # certification is forward-only: fast=True routes through the fused
        # Pallas stack (~2x XLA on v5e) with automatic CPU/shape fallback
        _, _, eps_fn, schedule = load_diffwave_eps_fn(args, fast=bool(args.use_pallas))
    transform = None if args.classifier_model == "m5" else Wave2Spect(n_mels=32)

    rc = RandomizedSmoothing(
        classifier_apply, transform=transform, eps_fn=eps_fn, schedule=schedule,
        num_classes=10, batch_size=args.certify_batch_size,
    )

    dataset = SC09Dataset(folder=args.data_path, transform=Compose([LoadAudio(), FixAudioLength()]),
                          num_per_class=args.num_per_class)
    loader = DataLoader(dataset, batch_size=args.batch_size, shuffle=False)

    rng = jax.random.PRNGKey(args.seed)
    records = []
    correct = abstain = total = 0
    out_file = args.save_path or f"certified_sigma{args.sigma}_N{args.num_sampling}.jsonl"

    done = 0
    if args.resume and os.path.isfile(out_file):
        with open(out_file) as f:
            for line in f:
                if not line.strip():
                    continue
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    # a SIGKILL mid-write leaves a truncated trailing line —
                    # exactly the crash --resume exists for; redo that record
                    print("[warn] discarding partially-written trailing record")
                    break
                records.append(rec)
                done += 1
                correct += int(rec["y_pred"] == rec["y_true"] and rec["certified_radius"] > 0)
                abstain += int(rec["y_pred"] == -1)
        total = done
        if args.resume:
            with open(out_file, "w") as f:  # drop any truncated tail
                for rec in records:
                    f.write(json.dumps(rec) + "\n")
        print(f"resuming: {done} utterances already certified in {out_file}")

    seen = 0  # dataset position, independent of the record counter
    with open(out_file, "a" if args.resume else "w") as f:
        for batch in loader:
            if args.max_examples is not None and total >= args.max_examples:
                break
            y = np.asarray(batch["target"])
            rng, k = jax.random.split(rng)  # keep the key stream aligned across resumes
            if seen + len(y) <= done:  # whole batch already certified
                seen += len(y)
                continue
            x = jnp.asarray(batch["samples"])[:, None, :]
            if seen < done:  # partial batch (crash mid-flush): finish the tail
                skip = done - seen
                x, y = x[skip:], y[skip:]
                seen = done
            seen += len(y)
            y_pred, radius = rc.certify(x, sigma=args.sigma, n_0=args.n0, n=args.num_sampling,
                                        alpha=args.alpha, rng=k)
            for i in range(len(y)):
                rec = {
                    "id": total + i,
                    "sigma": args.sigma,
                    "y_true": int(y[i]),
                    "y_pred": int(y_pred[i]),
                    "certified_radius": float(radius[i]),
                }
                records.append(rec)
                f.write(json.dumps(rec) + "\n")
                f.flush()
            correct += int(((y_pred == y) & (radius > 0)).sum())
            abstain += int((y_pred == -1).sum())
            total += len(y)
            print(f"[{total}] certified acc: {100 * correct / total:.2f}%  abstain: {abstain}")
            if args.max_examples is not None and total >= args.max_examples:
                break

    print(f"\ncertified accuracy at sigma={args.sigma}, N={args.num_sampling}: {100 * correct / max(total, 1):.2f}%")
    print(f"records written to {out_file}")
    return records


if __name__ == "__main__":
    main()
