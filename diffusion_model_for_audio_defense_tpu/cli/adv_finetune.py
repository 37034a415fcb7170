"""Adversarial finetuning of the (defended) classifier.

Rebuild of ``adv_finetune.py``: generate CW adversarial examples against the
current system each epoch and finetune the classifier on them with SGD
(lr=1e-3, reference ``:240-262``). The reference's argument-order bug
``criterion(targets, pred_adv)`` (``:260``) is fixed here.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax


def build_parser():
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--data_path", default="datasets/speech_commands/train")
    p.add_argument("--classifier_model", type=str, default="resnext29_8_64")
    p.add_argument("--classifier_type", type=str, default="vanilla")
    p.add_argument("--classifier_path", type=str, default=None)
    p.add_argument("--num_per_class", type=int, default=10)
    p.add_argument("--ddpm_config", type=str, default="configs/config.json")
    p.add_argument("--ddpm_path", type=str, default=None)
    p.add_argument("--sample_step", type=int, default=1)
    p.add_argument("--t", type=int, default=1)
    p.add_argument("--t_delta", type=int, default=15)
    p.add_argument("--rand_t", action="store_true", default=False)
    p.add_argument("--no_pallas_grad", action="store_true", default=False,
                   help="disable the differentiable Pallas WaveNet stack "
                        "for attack gradients (fall back to XLA autodiff)")
    p.add_argument("--diffusion_type", type=str, default="ddpm")
    p.add_argument("--defense", type=str, default="None")
    p.add_argument("--bound_norm", type=str, choices=["linf", "l2"], default="linf")
    p.add_argument("--eps", type=int, default=65)
    p.add_argument("--max_iter_1", type=int, default=10)
    p.add_argument("--attack", type=str, default="CW")
    p.add_argument("--eot_attack_size", type=int, default=1)
    p.add_argument("--eot_defense_size", type=int, default=1)
    p.add_argument("--max_iter_2", type=int, default=0)
    p.add_argument("--verbose", type=int, default=0)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=20)
    p.add_argument("--save_dir", type=str, default="checkpoints/adv_finetune")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_batches", type=int, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ._common import build_attacker, build_classifier, build_defender
    from ..attacks.losses import cross_entropy
    from ..core.checkpoint import save_pytree
    from ..data import DataLoader, SC09Dataset
    from ..models import create_model
    from ..ops import Wave2Spect
    from ..system import AcousticSystem
    from ..transforms import Compose, FixAudioLength, LoadAudio

    model = create_model(args.classifier_model, num_classes=10, in_channels=1)
    _, variables, _ = build_classifier(args)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    w2s = Wave2Spect(n_mels=32)

    defender, defense_type, stochastic = build_defender(args)
    tx = optax.sgd(args.lr, momentum=0.9)
    opt_state = tx.init(params)

    def system_of(p, bs):
        apply_fn = lambda s: model.apply({"params": p, "batch_stats": bs}, s)
        return AcousticSystem(apply_fn, w2s, defender, defense_type, defender_stochastic=stochastic)

    @jax.jit
    def finetune_step(p, bs, opt_state, x_adv, y, rng):
        def loss_fn(pp):
            inp = w2s(x_adv)
            logits, mut = model.apply({"params": pp, "batch_stats": bs}, inp, train=True,
                                      mutable=["batch_stats"], rngs={"dropout": rng})
            return jnp.mean(cross_entropy(logits, y)), mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), new_bs, opt_state, loss

    dataset = SC09Dataset(folder=args.data_path, transform=Compose([LoadAudio(), FixAudioLength()]),
                          num_per_class=args.num_per_class)
    rng = jax.random.PRNGKey(args.seed)

    for epoch in range(args.epochs):
        loader = DataLoader(dataset, batch_size=args.batch_size, shuffle=True, seed=epoch)
        system = system_of(params, batch_stats)
        attacker = build_attacker(args, system)
        losses, accs = [], []
        for bi, batch in enumerate(loader):
            if args.max_batches is not None and bi >= args.max_batches:
                break
            x = jnp.asarray(batch["samples"])[:, None, :]
            y = jnp.asarray(batch["target"])
            rng, k_atk, k_tr = jax.random.split(rng, 3)
            adv, _ = attacker.generate(x, y, targeted=False, rng=k_atk)
            params, batch_stats, opt_state, loss = finetune_step(
                params, batch_stats, opt_state, jnp.asarray(adv, x.dtype), y, k_tr
            )
            losses.append(float(loss))
        print(f"epoch {epoch}: adv loss {np.mean(losses):.4f}")
        os.makedirs(args.save_dir, exist_ok=True)
        save_pytree(os.path.join(args.save_dir, "advft-last"),
                    {"params": params, "batch_stats": batch_stats})
    return params


if __name__ == "__main__":
    main()
