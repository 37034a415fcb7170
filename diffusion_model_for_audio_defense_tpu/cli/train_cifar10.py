"""CIFAR-10 classifier training / evaluation.

Rebuild of ``audio_models/ConvNets_SpeechCommands/{train,test}_cifar10.py``:
the same ConvNets zoo on 3×32×32 images (random-crop + hflip augmentation,
SGD with plateau decay). ``--eval_only`` reproduces ``test_cifar10.py``.
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--data_root", default="datasets/cifar-10-batches-py")
    p.add_argument("--model", type=str, default="vgg19_bn")
    p.add_argument("--mode", choices=["vanilla", "mixup"], default="vanilla")
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--weight_decay", type=float, default=1e-2)
    p.add_argument("--epochs", type=int, default=70)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--save_dir", type=str, default="checkpoints/cifar10")
    p.add_argument("--eval_only", action="store_true", default=False)
    p.add_argument("--classifier_path", type=str, default=None)
    p.add_argument("--max_batches_per_epoch", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    return p


class _ImageLoaderAdapter:
    """Adapts CIFAR batches to the ClassifierTrainer's waveform protocol:
    the trainer feeds x[:, None, :] so we hand it flattened images and
    un-flatten inside the transform."""

    def __init__(self, loader, max_batches=None):
        self.loader = loader
        self.max_batches = max_batches

    def set_epoch(self, e):
        self.loader.set_epoch(e)

    def __iter__(self):
        for bi, batch in enumerate(self.loader):
            if self.max_batches is not None and bi >= self.max_batches:
                break
            imgs = batch["image"].reshape(len(batch["target"]), -1)
            yield {"samples": imgs, "target": batch["target"]}


def _unflatten(x):  # (B, 1, 3*32*32) → (B, 3, 32, 32)
    return x[:, 0, :].reshape(x.shape[0], 3, 32, 32)


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ..core.checkpoint import load_pytree
    from ..data.cifar10 import CIFAR10Dataset
    from ..data.loader import DataLoader
    from ..models import create_model
    from ..train import ClassifierTrainer

    model = create_model(args.model, num_classes=10, in_channels=3)
    rng = np.random.default_rng(args.seed)
    test_ds = CIFAR10Dataset(args.data_root, train=False)
    test_loader = _ImageLoaderAdapter(DataLoader(test_ds, batch_size=args.batch_size, shuffle=False))

    trainer = ClassifierTrainer(
        model, transform=_unflatten, mode=args.mode, lr=args.lr, weight_decay=args.weight_decay,
        save_dir=args.save_dir, sample_input=jnp.zeros((1, 1, 3 * 32 * 32)),
    )
    if args.classifier_path:
        # typed restore: optax namedtuple opt_state comes back as dicts otherwise
        trainer.state = load_pytree(args.classifier_path, target=trainer.state)

    if args.eval_only:
        loss, acc = trainer.evaluate(test_loader)
        print(f"CIFAR-10 test accuracy: {100 * acc:.2f}%")
        return acc

    train_ds = CIFAR10Dataset(args.data_root, train=True, augment_rng=rng)
    train_loader = _ImageLoaderAdapter(
        DataLoader(train_ds, batch_size=args.batch_size, shuffle=True, drop_last=True, seed=args.seed),
        max_batches=args.max_batches_per_epoch,
    )
    for epoch in range(args.epochs):
        tr_loss, tr_acc = trainer.train_epoch(train_loader, epoch)
        va_loss, va_acc = trainer.evaluate(test_loader)
        trainer.maybe_checkpoint(va_loss, va_acc, "cifar10")
        print(f"epoch {epoch}: train acc {100 * tr_acc:.2f}%  test acc {100 * va_acc:.2f}%")
    return trainer


if __name__ == "__main__":
    main()
