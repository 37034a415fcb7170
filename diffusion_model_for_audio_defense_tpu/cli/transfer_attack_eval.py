"""Transfer / model-stealing attack evaluation.

Rebuild of ``transfer_attack_eval.py``: attack a *surrogate* classifier
(trained by model stealing — see ``cli/model_stealing.py``) in a white-box
fashion, then evaluate how the adversarial examples transfer to the
defended victim system. Metrics: surrogate agreement (acc_steal), vanilla
clean/robust and defended clean/robust accuracy (reference ``:470-533``).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--data_path", default="datasets/speech_commands/test")
    p.add_argument("--classifier_model", type=str, default="resnext29_8_64")
    p.add_argument("--classifier_type", type=str, default="vanilla")
    p.add_argument("--classifier_path", type=str, default=None, help="victim checkpoint")
    p.add_argument("--surrogate_model", type=str, default="resnext29_8_64")
    p.add_argument("--surrogate_path", type=str, default=None, help="stolen surrogate checkpoint (orbax dir)")
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
    p.add_argument("--bf16", action="store_true", default=False,
        help="bfloat16 compute for the diffusion nets (WaveNet eps-net "
             "and the Diffusion-Spec UNet); params stay f32")
    p.add_argument("--diffusion_type", type=str, default="ddpm")
    p.add_argument("--defense", type=str, default="Diffusion",
                   choices=["Diffusion", "AS", "MS", "DS", "LPF", "BPF", "None"])
    p.add_argument("--bound_norm", type=str, choices=["linf", "l2"], default="linf")
    p.add_argument("--eps", type=int, default=65)
    p.add_argument("--max_iter_1", type=int, default=30)
    p.add_argument("--verbose", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_batches", type=int, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ._common import build_classifier, build_defender, load_variables
    from ..attacks import AudioAttack
    from ..data import DataLoader, SC09Dataset
    from ..models import create_model
    from ..ops import Wave2Spect
    from ..system import AcousticSystem
    from ..transforms import Compose, FixAudioLength, LoadAudio

    # victim (defended) system
    _, _, victim_apply = build_classifier(args)
    defender, defense_type, stochastic = build_defender(args)
    w2s = None if args.classifier_model == "m5" else Wave2Spect(n_mels=32)
    victim = AcousticSystem(victim_apply, w2s, defender, defense_type, defender_stochastic=stochastic)

    # surrogate (undefended) — white-box target of the attack
    surrogate = create_model(args.surrogate_model, num_classes=10, in_channels=1)
    sv = load_variables(args.surrogate_path, args.surrogate_model)
    if sv is None:
        import sys

        print("[warn] surrogate checkpoint missing; using random init", file=sys.stderr)
        init_shape = (1, 1, 16000) if args.surrogate_model == "m5" else (1, 1, 32, 32)
        sv = surrogate.init(jax.random.PRNGKey(1), jnp.zeros(init_shape))
    sur_w2s = None if args.surrogate_model == "m5" else Wave2Spect(n_mels=32)
    surrogate_system = AcousticSystem(lambda s: surrogate.apply(sv, s), sur_w2s, None, "wave")

    attacker = AudioAttack(
        lambda x, rng: surrogate_system(x, rng, defend=False),
        eps=args.eps, norm=args.bound_norm, max_iter_1=args.max_iter_1, max_iter_2=0,
        learning_rate_1=args.eps / 5 if args.bound_norm == "linf" else args.eps / 50,
        verbose=args.verbose,
    )

    dataset = SC09Dataset(folder=args.data_path, transform=Compose([LoadAudio(), FixAudioLength()]),
                          num_per_class=args.num_per_class)
    loader = DataLoader(dataset, batch_size=args.batch_size, shuffle=False)

    rng = jax.random.PRNGKey(args.seed)
    from ..core.functional import jit_hoisted

    vic_clean = jit_hoisted(lambda x: victim(x, None, defend=False))
    sur_clean = jit_hoisted(lambda x: surrogate_system(x, None, defend=False))
    stats = dict(total=0, steal_agree=0, vanilla_clean=0, vanilla_robust=0, defended_clean=0, defended_robust=0)

    for bi, batch in enumerate(loader):
        if args.max_batches is not None and bi >= args.max_batches:
            break
        x = jnp.asarray(batch["samples"])[:, None, :]
        y = np.asarray(batch["target"])
        rng, k_atk, k_d1, k_d2 = jax.random.split(rng, 4)

        pred_vic = np.asarray(jnp.argmax(vic_clean(x), -1))
        pred_sur = np.asarray(jnp.argmax(sur_clean(x), -1))
        adv, _ = attacker.generate(x, jnp.asarray(y), targeted=False, rng=k_atk)
        adv = jnp.asarray(adv, x.dtype)
        pred_vic_adv = np.asarray(jnp.argmax(vic_clean(adv), -1))
        pred_def_clean = np.asarray(jnp.argmax(victim(x, k_d1, defend=True), -1))
        pred_def_adv = np.asarray(jnp.argmax(victim(adv, k_d2, defend=True), -1))

        stats["total"] += len(y)
        stats["steal_agree"] += int((pred_sur == pred_vic).sum())
        stats["vanilla_clean"] += int((pred_vic == y).sum())
        stats["vanilla_robust"] += int((pred_vic_adv == y).sum())
        stats["defended_clean"] += int((pred_def_clean == y).sum())
        stats["defended_robust"] += int((pred_def_adv == y).sum())
        t = stats["total"]
        print(f"[{t}] steal agreement {100 * stats['steal_agree'] / t:.2f}%  "
              f"vanilla clean/robust {100 * stats['vanilla_clean'] / t:.2f}/{100 * stats['vanilla_robust'] / t:.2f}%  "
              f"defended clean/robust {100 * stats['defended_clean'] / t:.2f}/{100 * stats['defended_robust'] / t:.2f}%")

    t = max(stats["total"], 1)
    print(f"\nacc_steal (surrogate agreement): {100 * stats['steal_agree'] / t:.4f}%")
    print(f"vanilla clean acc: {100 * stats['vanilla_clean'] / t:.4f}%   "
          f"vanilla robust acc (transfer): {100 * stats['vanilla_robust'] / t:.4f}%")
    print(f"defended clean acc: {100 * stats['defended_clean'] / t:.4f}%   "
          f"defended robust acc (transfer): {100 * stats['defended_robust'] / t:.4f}%")
    return stats


if __name__ == "__main__":
    main()
