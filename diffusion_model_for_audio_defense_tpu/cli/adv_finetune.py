"""Adversarial finetuning of the (defended) classifier.

Rebuild of ``adv_finetune.py``: per batch, generate CW adversarial examples
against the CURRENT weights and finetune the classifier on the DEFENDED
forward of those examples with SGD (lr=1e-3, reference ``:240-262``).

Intentional fixes vs the reference (documented deviations):
- ``criterion(targets, pred_adv)`` argument-order bug (``:260``) fixed;
- the reference never calls ``opt.zero_grad()`` (gradients accumulate
  forever) — here each step uses fresh grads;
- the reference's SGD nominally covers ALL AS_MODEL parameters incl. the
  purifier; here the optimizer covers the classifier (grads still flow
  through the purifier), which is the recoverable intent of the recipe.
Live weights reach the attacker as traced ``model_state`` so the attack
graph compiles once for the whole run.
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
    p.add_argument("--no_pallas_attention", action="store_true", default=False,
                        help="disable the fused Pallas UNet attention for the "
                             "spec defense (fall back to the einsum path)")
    p.add_argument("--remat_cycles", type=int, default=None,
        help="force (1) / disable (0) per-cycle rematerialization in the "
             "Pallas backward; default auto-enables above a ~12 GB stash")
    p.add_argument("--fused_stage_1", action="store_true", default=False,
        help="run attack stage 1 as one on-device lax.fori_loop (no "
             "per-iteration host sync); host loop stays the default")
    p.add_argument("--fused_stage_2", action="store_true", default=False,
        help="run Qin stage 2 as one on-device lax.while_loop (no "
             "per-iteration host sync); host loop stays the default")
    p.add_argument("--bf16", action="store_true", default=False,
        help="bfloat16 compute for the diffusion nets (WaveNet eps-net "
             "and the Diffusion-Spec UNet); params stay f32")
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
    from ..ops import Wave2Spect
    from ..system import AcousticSystem
    from ..transforms import Compose, FixAudioLength, LoadAudio

    model, variables, _ = build_classifier(args)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    # m5 takes the raw waveform (reference adv_finetune.py:115,159)
    w2s = None if args.classifier_model == "m5" else Wave2Spect(n_mels=32)

    defender, defense_type, stochastic = build_defender(args)
    tx = optax.sgd(args.lr, momentum=0.9)
    opt_state = tx.init(params)

    def defended_forward(p, bs, x, rng, train=False, drop_rng=None):
        # defender → transform → classifier with explicit (traced) weights:
        # the reference's pred_adv = AS_MODEL(waveforms_adv) defended forward
        apply_fn = lambda s: model.apply({"params": p, "batch_stats": bs}, s)
        if train:
            apply_fn = lambda s: model.apply(
                {"params": p, "batch_stats": bs}, s, train=True,
                mutable=["batch_stats"], rngs={"dropout": drop_rng})
        system = AcousticSystem(apply_fn, w2s, defender, defense_type, defender_stochastic=stochastic)
        return system(x, rng, defend=True)

    # live weights flow to the attacker as TRACED model_state, so the whole
    # run compiles the attack graph ONCE and still attacks the current
    # weights every batch (the reference's torch modules update in place)
    attack_model = lambda x, rng, p, bs: defended_forward(p, bs, x, rng)

    @jax.jit
    def finetune_step(p, bs, opt_state, x_adv, y, rng):
        k_def, k_drop = jax.random.split(rng)

        def loss_fn(pp):
            logits, mut = defended_forward(pp, bs, x_adv, k_def, train=True, drop_rng=k_drop)
            return jnp.mean(cross_entropy(logits, y)), mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), new_bs, opt_state, loss

    dataset = SC09Dataset(folder=args.data_path, transform=Compose([LoadAudio(), FixAudioLength()]),
                          num_per_class=args.num_per_class)
    rng = jax.random.PRNGKey(args.seed)
    if args.attack not in ("CW", "Qin-I"):
        raise SystemExit("adv_finetune supports the white-box CW/Qin-I attacks "
                         "(the reference finetunes against CW); black-box attacks "
                         "don't take live model state")
    attacker = build_attacker(args, None, model_fn=attack_model)

    for epoch in range(args.epochs):
        loader = DataLoader(dataset, batch_size=args.batch_size, shuffle=True, seed=epoch)
        losses = []
        for bi, batch in enumerate(loader):
            if args.max_batches is not None and bi >= args.max_batches:
                break
            x = jnp.asarray(batch["samples"])[:, None, :]
            y = jnp.asarray(batch["target"])
            rng, k_atk, k_tr = jax.random.split(rng, 3)
            adv, _ = attacker.generate(x, y, targeted=False, rng=k_atk,
                                       model_state=(params, batch_stats))
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
