"""Adaptive attack evaluation on the Qualcomm keyword RCNN.

Flag-compatible rebuild of ``kws_adaptive_attack_eval.py``: same harness as
the SC09 driver but with the 4-class attention-RCNN (n_mels=32 mel input,
batch_size=1 per-utterance eval, variable-length audio).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--data_path", default="datasets/qualcomm_keyword_speech_dataset")
    p.add_argument("--classifier_path", type=str, default=None, help="KWS checkpoint (orbax dir or torch .pth)")
    p.add_argument("--classifier_type", type=str, choices=["advtr", "vanilla"], default="vanilla")
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
    p.add_argument("--fused_loop", action="store_true", default=False,
        help="black-box attacks (FAKEBOB, SirenAttack): run the whole "
             "iteration loop as one on-device lax.while_loop; host loop "
             "stays the default")
    p.add_argument("--bf16", action="store_true", default=False,
        help="bfloat16 compute for the diffusion nets (WaveNet eps-net "
             "and the Diffusion-Spec UNet); params stay f32")
    p.add_argument("--diffusion_type", type=str, default="ddpm")
    p.add_argument("--score_type", type=str, default="guided_diffusion")
    p.add_argument("--use_bm", action="store_true", default=False,
                        help="accepted for reference-CLI compatibility; a no-op here - the Euler-Maruyama scan draws noise from the threaded PRNG key, so SDE paths are always reproducible (the reference needs torchsde BrownianInterval for this)")
    p.add_argument("--attack", type=str, choices=["CW", "Qin-I", "Kenansville", "FAKEBOB", "SirenAttack"], default="CW")
    p.add_argument("--defense", type=str,
                   choices=["Diffusion", "AS", "MS", "DS", "LPF", "BPF", "None"], default="None")
    p.add_argument("--bound_norm", type=str, choices=["linf", "l2"], default="linf")
    p.add_argument("--eps", type=int, default=65)
    p.add_argument("--max_iter_1", type=int, default=10)
    p.add_argument("--max_iter_2", type=int, default=0)
    p.add_argument("--eot_attack_size", type=int, default=1)
    p.add_argument("--eot_defense_size", type=int, default=1)
    p.add_argument("--verbose", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=1)  # KWS eval is per-utterance
    p.add_argument("--gpu", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_batches", type=int, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ._common import build_attacker, build_defender
    from ..core.checkpoint import load_pytree
    from ..data import DataLoader, QualcommKeywordSpottingDataset
    from ..models.rcnn_kws import KWSModel
    from ..ops import Wave2Spect
    from ..system import AcousticSystem
    from ..transforms import Compose, FixAudioLength, LoadAudio

    model = KWSModel(in_size=32, num_classes=4)
    if args.classifier_path and not os.path.isdir(args.classifier_path):
        # reference torch state dicts (kws_adaptive_attack_eval.py:82-95)
        from ..core.checkpoint import load_classifier_checkpoint

        variables = load_classifier_checkpoint(args.classifier_path, "rcnn_kws")
    elif args.classifier_path:
        variables = load_pytree(args.classifier_path)
    else:
        import sys

        print("[warn] KWS checkpoint not given; using random init", file=sys.stderr)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 32, 32)))
    classifier_apply = lambda s: model.apply(variables, s)

    defender, defense_type, stochastic = build_defender(args)
    system = AcousticSystem(classifier_apply, Wave2Spect(n_mels=32), defender, defense_type,
                            defender_stochastic=stochastic)
    args.classifier_model = "kws"  # for printing only
    attacker = build_attacker(args, system)

    dataset = QualcommKeywordSpottingDataset(
        folder=args.data_path, transform=Compose([LoadAudio(), FixAudioLength()]), split="Test"
    )
    loader = DataLoader(dataset, batch_size=args.batch_size, shuffle=False)

    rng = jax.random.PRNGKey(args.seed)
    from ..core.functional import jit_hoisted

    clean_fwd = jit_hoisted(lambda x: system(x, None, defend=False))
    correct_orig = correct_def = correct_adv = total = 0
    for bi, batch in enumerate(loader):
        if args.max_batches is not None and bi >= args.max_batches:
            break
        x = jnp.asarray(batch["samples"])[:, None, :]
        y = np.asarray(batch["target"])
        rng, k_def, k_atk = jax.random.split(rng, 3)
        pred_clean = np.asarray(jnp.argmax(clean_fwd(x), -1))
        xd = x if system.defender is None else system._run_defender(x, k_def)
        pred_def = np.asarray(jnp.argmax(clean_fwd(xd), -1))
        adv, success = attacker.generate(x, jnp.asarray(y), targeted=False, rng=k_atk)
        stage1 = success[0] if isinstance(success, tuple) else success
        total += len(y)
        correct_orig += int((pred_clean == y).sum())
        correct_def += int((pred_def == y).sum())
        correct_adv += len(y) - int(np.sum(stage1))
        print(f"[{total}] clean {100 * correct_orig / total:.2f}%  denoised {100 * correct_def / total:.2f}%  "
              f"robust {100 * correct_adv / total:.2f}%")

    print(f"\non {total} keyword test examples:")
    print(f"original clean accuracy: {100 * correct_orig / max(total, 1):.4f}%")
    print(f"denoised clean accuracy: {100 * correct_def / max(total, 1):.4f}%")
    print(f"{args.attack} robust accuracy: {100 * correct_adv / max(total, 1):.4f}%")
    return {"clean": correct_orig / max(total, 1), "robust": correct_adv / max(total, 1)}


if __name__ == "__main__":
    main()
