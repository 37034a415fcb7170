"""Speech-Commands classifier training (all modes).

Rebuild of ``audio_models/ConvNets_SpeechCommands/{train,adv_train,
reg_train}_speech_commands.py``, ``M5/train.py`` and ``RCNN_KWS/train.py``:
one driver with ``--mode {vanilla,adv,gaussian,jacobian,mixup}`` covering
vanilla SGD+plateau, waveform-PGD adversarial training, Gaussian
augmentation (for randomized smoothing), Jacobian regularization and mixup.
Checkpoint names follow the reference's load-bearing conventions
(``vanilla-best-acc`` / ``advtr-best-acc`` / ``sigma={σ}-best-acc`` /
``reg={λ}-best-robust-acc``).
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp


def build_parser():
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--train_path", default="datasets/speech_commands/train")
    p.add_argument("--valid_path", default="datasets/speech_commands/valid")
    p.add_argument("--dataset", choices=["sc09", "sc", "qualcomm"], default="sc09")
    p.add_argument("--model", type=str, default="resnext29_8_64")
    p.add_argument("--mode", choices=["vanilla", "adv", "gaussian", "jacobian", "mixup"], default="vanilla")
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--weight_decay", type=float, default=1e-2)
    p.add_argument("--epochs", type=int, default=70)
    p.add_argument("--batch_size", type=int, default=96)
    p.add_argument("--sigma", type=float, default=0.25, help="gaussian-augment std")
    p.add_argument("--reg", type=float, default=1e-8, help="jacobian regularization weight")
    p.add_argument("--adv_eps", type=float, default=0.002)
    p.add_argument("--adv_alpha", type=float, default=0.0004)
    p.add_argument("--adv_steps", type=int, default=10)
    p.add_argument("--balanced_sampling", action="store_true", default=False)
    p.add_argument("--save_dir", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_per_class", type=int, default=10**9)
    p.add_argument("--max_batches_per_epoch", type=int, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from ..data import DataLoader, SC09Dataset, SpeechCommandsDataset
    from ..models import create_model
    from ..ops import Wave2Spect
    from ..train import ClassifierTrainer
    from ..train import logger as tlog

    num_classes = {"sc09": 10, "sc": 12, "qualcomm": 4}[args.dataset]
    from ..transforms import Compose, FixAudioLength, LoadAudio

    tfm = Compose([LoadAudio(), FixAudioLength()])
    if args.dataset == "sc":
        train_ds = SpeechCommandsDataset(args.train_path, transform=tfm)
        valid_ds = SpeechCommandsDataset(args.valid_path, transform=tfm)
    else:
        train_ds = SC09Dataset(args.train_path, transform=tfm, num_per_class=args.num_per_class)
        valid_ds = SC09Dataset(args.valid_path, transform=tfm, num_per_class=args.num_per_class)

    weights = train_ds.make_weights_for_balanced_classes() if args.balanced_sampling else None
    train_loader = DataLoader(train_ds, batch_size=args.batch_size, shuffle=True, weights=weights,
                              drop_last=True, seed=args.seed)
    valid_loader = DataLoader(valid_ds, batch_size=args.batch_size, shuffle=False)
    if args.max_batches_per_epoch:
        train_loader.num_samples = args.max_batches_per_epoch * args.batch_size

    model = create_model(args.model, num_classes=num_classes, in_channels=1)
    is_wave_model = args.model == "m5"
    transform = None if is_wave_model else Wave2Spect(n_mels=32)
    sample = jnp.zeros((1, 1, 16000))  # waveform seam; trainer applies `transform` for spec models

    save_dir = args.save_dir or f"checkpoints/{args.model}_sgd_plateau_bs{args.batch_size}_lr{args.lr:.1e}_wd{args.weight_decay:.1e}"
    tlog.configure(save_dir, ["stdout", "csv"])
    trainer = ClassifierTrainer(
        model, transform=transform, mode=args.mode, lr=args.lr, weight_decay=args.weight_decay,
        sigma=args.sigma, jacobian_lambda=args.reg, adv_eps=args.adv_eps, adv_alpha=args.adv_alpha,
        adv_steps=args.adv_steps, save_dir=save_dir, sample_input=sample,
    )

    ckpt_name = {
        "vanilla": "vanilla",
        "adv": "advtr",
        "gaussian": f"sigma={args.sigma}",
        "jacobian": f"reg={args.reg}",
        "mixup": "mixup",
    }[args.mode]

    for epoch in range(args.epochs):
        tr_loss, tr_acc = trainer.train_epoch(train_loader, epoch)
        va_loss, va_acc = trainer.evaluate(valid_loader)
        trainer.maybe_checkpoint(va_loss, va_acc, ckpt_name)
        tlog.logkv("epoch", epoch)
        tlog.logkv("valid_loss", va_loss)
        tlog.logkv("valid_acc", va_acc)
        tlog.dumpkvs()
    print(f"best valid acc: {trainer.best_acc * 100:.4f}%  (checkpoints in {save_dir})")
    return trainer


if __name__ == "__main__":
    main()
