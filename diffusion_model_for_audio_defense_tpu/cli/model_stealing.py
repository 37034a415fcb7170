"""Model stealing: train a surrogate on the victim's predictions.

Real equivalent of the reference's gitignored ``model_stealing.py``
(invoked by ``scripts/model_stealing.sh``; SURVEY.md §2.1 "missing-by-
gitignore"): query the (black-box) victim on training audio, train a
surrogate classifier on the victim's hard labels, then use the surrogate
for transfer attacks (``cli/transfer_attack_eval.py``).
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--data_path", default="datasets/speech_commands/train")
    p.add_argument("--classifier_model", type=str, default="resnext29_8_64", help="victim architecture")
    p.add_argument("--classifier_type", type=str, default="vanilla")
    p.add_argument("--classifier_path", type=str, default=None, help="victim checkpoint")
    p.add_argument("--surrogate_model", type=str, default="resnext29_8_64")
    p.add_argument("--num_per_class", type=int, default=10**9)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch_size", type=int, default=96)
    p.add_argument("--save_dir", type=str, default="checkpoints/surrogate")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_batches_per_epoch", type=int, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ._common import build_classifier
    from ..data import DataLoader, SC09Dataset
    from ..models import create_model
    from ..ops import Wave2Spect
    from ..train import ClassifierTrainer
    from ..transforms import Compose, FixAudioLength, LoadAudio

    _, _, victim_apply = build_classifier(args)
    w2s = None if args.classifier_model == "m5" else Wave2Spect(n_mels=32)
    from ..core.functional import jit_hoisted

    victim_label = jit_hoisted(lambda x: jnp.argmax(victim_apply(w2s(x) if w2s is not None else x), -1))

    dataset = SC09Dataset(args.data_path, transform=Compose([LoadAudio(), FixAudioLength()]),
                          num_per_class=args.num_per_class)
    loader = DataLoader(dataset, batch_size=args.batch_size, shuffle=True, drop_last=True, seed=args.seed)

    surrogate = create_model(args.surrogate_model, num_classes=10, in_channels=1)
    sur_w2s = None if args.surrogate_model == "m5" else Wave2Spect(n_mels=32)
    trainer = ClassifierTrainer(surrogate, transform=sur_w2s, mode="vanilla", lr=args.lr,
                                save_dir=args.save_dir, sample_input=jnp.zeros((1, 1, 16000)))

    class StolenLoader:
        """Replaces ground-truth targets with victim predictions."""

        def set_epoch(self, e):
            loader.set_epoch(e)

        def __iter__(self):
            for bi, batch in enumerate(loader):
                if args.max_batches_per_epoch and bi >= args.max_batches_per_epoch:
                    break
                x = jnp.asarray(batch["samples"])[:, None, :]
                batch["target"] = np.asarray(victim_label(x))
                yield batch

    stolen = StolenLoader()
    for epoch in range(args.epochs):
        loss, agree = trainer.train_epoch(stolen, epoch)
        print(f"epoch {epoch}: stealing loss {loss:.4f}, agreement with victim {agree * 100:.2f}%")
        trainer.maybe_checkpoint(loss, agree, "surrogate")
    print(f"surrogate saved under {args.save_dir}")
    return trainer


if __name__ == "__main__":
    main()
