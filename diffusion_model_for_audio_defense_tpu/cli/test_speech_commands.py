"""Classifier accuracy evaluation (with optional multi-crop).

Rebuild of ``audio_models/ConvNets_SpeechCommands/test_speech_commands.py``:
plain accuracy over a test folder, optional multi-crop (shifted time crops of
the mel input, averaged logits) and a Kaggle-style CSV of predictions.
"""

from __future__ import annotations

import argparse
import csv
import os

import jax
import jax.numpy as jnp
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--data_path", default="datasets/speech_commands/test")
    p.add_argument("--dataset", choices=["sc09", "sc"], default="sc09")
    p.add_argument("--classifier_model", type=str, default="resnext29_8_64")
    p.add_argument("--classifier_type", type=str, default="vanilla")
    p.add_argument("--classifier_path", type=str, default=None)
    p.add_argument("--multi_crop", action="store_true", default=False)
    p.add_argument("--kaggle_csv", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--num_per_class", type=int, default=10**9)
    p.add_argument("--max_batches", type=int, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ._common import build_classifier
    from ..data import DataLoader, SC09Dataset, SpeechCommandsDataset
    from ..ops import Wave2Spect
    from ..transforms import Compose, FixAudioLength, LoadAudio

    num_classes = 10 if args.dataset == "sc09" else 12
    _, _, classifier_apply = build_classifier(args, num_classes=num_classes)
    w2s = None if args.classifier_model == "m5" else Wave2Spect(n_mels=32)

    def logits_fn(x):
        inp = w2s(x) if w2s is not None else x
        return classifier_apply(inp)

    def multi_crop_logits(x):
        """Average logits over shifted time crops (reference multi-crop eval)."""
        shift = x.shape[-1] // 10
        variants = [x, jnp.roll(x, shift, axis=-1), jnp.roll(x, -shift, axis=-1)]
        return sum(jax.nn.softmax(logits_fn(v), -1) for v in variants) / len(variants)

    from ..core.functional import jit_hoisted

    fwd = jit_hoisted(multi_crop_logits if args.multi_crop else logits_fn)

    tfm = Compose([LoadAudio(), FixAudioLength()])
    if args.dataset == "sc09":
        ds = SC09Dataset(args.data_path, transform=tfm, num_per_class=args.num_per_class)
    else:
        ds = SpeechCommandsDataset(args.data_path, transform=tfm)
    loader = DataLoader(ds, batch_size=args.batch_size, shuffle=False)

    rows = []
    correct = total = 0
    for bi, batch in enumerate(loader):
        if args.max_batches is not None and bi >= args.max_batches:
            break
        x = jnp.asarray(batch["samples"])[:, None, :]
        y = np.asarray(batch["target"])
        pred = np.asarray(jnp.argmax(fwd(x), -1))
        correct += int((pred == y).sum())
        total += len(y)
        for path, p in zip(batch["path"], pred):
            rows.append((os.path.basename(path), ds.classes[int(p)]))
        print(f"[{total}] accuracy: {100 * correct / total:.6f}%")

    print(f"\ntest accuracy: {100 * correct / max(total, 1):.6f}% ({correct}/{total})")
    if args.kaggle_csv:
        with open(args.kaggle_csv, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["fname", "label"])
            w.writerows(rows)
        print(f"kaggle csv written to {args.kaggle_csv}")
    return correct / max(total, 1)


if __name__ == "__main__":
    main()
