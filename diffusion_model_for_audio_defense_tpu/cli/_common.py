"""Shared builders for the CLI drivers.

Mirrors the construction logic of ``adaptive_attack_eval.py:60-231`` (and
the KWS/transfer variants): classifier selection + checkpoint load, the
Wave2Spect front-end, the 10 defense choices, the 5 attack choices.

Checkpoints: native Orbax directories load directly; torch ``.pth``/``.pkl``
files are converted on the fly (``core/checkpoint``); a missing path falls
back to random init with a loud warning so every driver can be exercised
end-to-end without the reference's artifacts.
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp

from ..core import linear_schedule
from ..core.checkpoint import load_classifier_checkpoint, load_diffwave_checkpoint, load_pytree
from ..models import create_model
from ..models.wavenet import WaveNet, wavenet_from_config
from ..ops import Wave2Spect
from ..purify import DiffWavePurifier, RevDiffWavePurifier
from ..system import AcousticSystem

CLASSIFIER_PATHS = {
    # reference checkpoint directory conventions (adaptive_attack_eval.py:76-98)
    "resnext29_8_64": "audio_models/ConvNets_SpeechCommands/checkpoints/resnext29_8_64_sgd_plateau_bs64_lr1.0e-02_wd1.0e-02",
    "vgg19_bn": "audio_models/ConvNets_SpeechCommands/checkpoints/vgg19_bn_sgd_plateau_bs96_lr1.0e-02_wd1.0e-02",
    "densenet_bc_100_12": "audio_models/ConvNets_SpeechCommands/checkpoints/densenet_bc_100_12_sgd_plateau_bs96_lr1.0e-02_wd1.0e-02",
    "wideresnet28_10": "audio_models/ConvNets_SpeechCommands/checkpoints/wideresnet28_10_sgd_plateau_bs96_lr1.0e-02_wd1.0e-02",
    "m5": "audio_models/M5/checkpoints/kernel_size=160",
}


def resolve_classifier_path(args) -> str:
    if getattr(args, "classifier_path", None):
        return args.classifier_path
    base = CLASSIFIER_PATHS[args.classifier_model]
    fname = {"vanilla": "vanilla-best-acc", "advtr": "advtr-best-acc"}[args.classifier_type]
    return os.path.join(base, fname + ".pth")


def load_variables(path: str, model_name: str):
    """Orbax dir → restore; .pth/.pkl → torch conversion; else None."""
    if path and os.path.isdir(path):
        return load_pytree(path)
    if path and os.path.isfile(path):
        return load_classifier_checkpoint(path, model_name)
    return None


def build_classifier(args, num_classes: int = 10):
    model = create_model(args.classifier_model, num_classes=num_classes, in_channels=1)
    path = resolve_classifier_path(args)
    variables = load_variables(path, args.classifier_model)
    if variables is None:
        print(f"[warn] classifier checkpoint not found at {path!r}; using random init", file=sys.stderr)
        init_shape = (1, 1, 16000) if args.classifier_model == "m5" else (1, 1, 32, 32)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros(init_shape))
    apply_fn = lambda x: model.apply(variables, x)
    return model, variables, apply_fn


def load_diffwave_eps_fn(args, fast: bool = False):
    """DiffWave ε-net + linear-200 schedule from the reference config/ckpt
    (``create_diffwave_model``, diffwave_ddpm.py:395-411).

    ``fast=True`` returns the fused Pallas-stack forward for forward-only
    workloads (certify, sampling) — ~2x the XLA forward on v5e. Otherwise
    (attack/gradient workloads) the TPU path is the DIFFERENTIABLE Pallas
    stack in input-grad-only mode (``grad_params=False`` — adaptive attacks
    differentiate w.r.t. the waveform; 1.7x XLA AD on v5e). Opt out with
    ``--use_pallas 0`` (certify/inference) or ``--no_pallas_grad`` (attack
    CLIs) — both reach the plain XLA ``wavenet.apply``. Falls back to the
    XLA path automatically on CPU or kernel-incompatible channel configs.
    Compute dtype follows ``args.bf16`` when the CLI defines it, else the
    model's own dtype (f32 when unset)."""
    import json

    # --bf16/--no-bf16 (certify CLI): override the model compute dtype
    bf16 = getattr(args, "bf16", None)
    dtype_override = {} if bf16 is None else {"dtype": jnp.bfloat16 if bf16 else None}

    cfg_path = getattr(args, "ddpm_config", None)
    if cfg_path and os.path.isfile(cfg_path):
        with open(cfg_path) as f:
            cfg = json.load(f)
        wavenet = wavenet_from_config(cfg["wavenet_config"], **dtype_override)
        dc = cfg["diffusion_config"]
        schedule = linear_schedule(dc["T"], dc["beta_0"], dc["beta_T"])
    else:
        wavenet = WaveNet(**dtype_override)
        schedule = linear_schedule(200)

    path = getattr(args, "ddpm_path", None)
    if path and os.path.isdir(path):
        variables = load_pytree(path)
    elif path and os.path.isfile(path):
        variables = load_diffwave_checkpoint(path, wavenet.num_res_layers)
    else:
        print(f"[warn] DiffWave checkpoint not found at {path!r}; using random init", file=sys.stderr)
        variables = wavenet.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 16000)), jnp.zeros((1, 1)))
    use_pallas = getattr(args, "use_pallas", None)  # None = flag not in this CLI
    pallas_ok = (
        (use_pallas is None or bool(use_pallas))
        and jax.default_backend() != "cpu"
        and wavenet.res_channels % 128 == 0
        and wavenet.skip_channels == wavenet.res_channels  # kernel concatenates res|skip slabs
    )
    dtype = wavenet.dtype or jnp.float32
    if fast and pallas_ok:
        from ..ops.pallas.wavenet_stack import wavenet_apply_stack

        eps_fn = lambda x, t: wavenet_apply_stack(
            variables, x, t[:, None], num_res_layers=wavenet.num_res_layers,
            dilation_cycle=wavenet.dilation_cycle, dtype=dtype)
    elif pallas_ok and not getattr(args, "no_pallas_grad", False):
        from ..ops.pallas.wavenet_stack import wavenet_apply_stack

        def eps_fn(x, t):
            # remat_cycles None = kernel auto: rematerialize per dilation
            # cycle when the AD stash (36·(B, L_pad, 2C)) would blow HBM
            # (2x fwd cost; perf/lab8_bwd.py / lab14 OOM at B=16 f32)
            remat = getattr(args, "remat_cycles", None)
            return wavenet_apply_stack(
                variables, x, t[:, None], num_res_layers=wavenet.num_res_layers,
                dilation_cycle=wavenet.dilation_cycle, dtype=dtype,
                differentiable=True, grad_params=False,
                remat_cycles=None if remat is None else bool(remat))
    else:
        eps_fn = lambda x, t: wavenet.apply(variables, x, t[:, None])
    return wavenet, variables, eps_fn, schedule


def build_defender(args, n_mels: int = 32):
    """The 10 defense choices (adaptive_attack_eval.py:118-179).

    Returns (defender, defense_type, stochastic) — defender is None for
    --defense None.
    """
    name = args.defense
    if name == "None":
        return None, "wave", False
    if name == "Diffusion":
        _, _, eps_fn, schedule = load_diffwave_eps_fn(args)
        if getattr(args, "diffusion_type", "sde") == "ddpm":
            defender = DiffWavePurifier.from_eps_fn(eps_fn, schedule, reverse_timestep=args.t)
        else:
            defender = RevDiffWavePurifier.from_eps_fn(
                eps_fn, schedule, t=args.t, sample_step=args.sample_step,
                rand_t=args.rand_t, t_delta=args.t_delta,
            )
        return defender, "wave", True
    if name == "Diffusion-Spec":
        from ..models.unet import create_unet
        from ..purify.spec import RevImprovedDiffusionPurifier, load_mel_bounds

        from ..models.unet import infer_unet_kwargs

        # --bf16 (when the CLI defines it) switches the UNet compute dtype —
        # 1.35x the f32 forward on v5e (perf/lab13); params stay f32
        bf16 = getattr(args, "bf16", None)
        dtype = jnp.bfloat16 if bf16 else None
        # fused Pallas attention on TPU (perf/lab22) — per-block shape guard
        # lives in AttentionBlock/supports, so reduced checkpoints just fall
        # back; --no_pallas_attention opts out (mirrors --no_pallas_grad).
        # Gate on == "tpu": the kernel uses pltpu.CompilerParams (ADVICE r4).
        pattn = (jax.default_backend() == "tpu"
                 and not getattr(args, "no_pallas_attention", False))
        path = getattr(args, "ddpm_path", None)
        variables = None
        if path and os.path.isdir(path):
            variables = load_pytree(path)
        elif path and os.path.isfile(path):
            from ..core.checkpoint import load_unet_checkpoint

            variables = load_unet_checkpoint(path)  # reference model084000.pt format
        if variables is not None:
            # geometry comes from the checkpoint itself (non-reference widths,
            # e.g. the reduced configs of scripts/train_real_spec.py)
            try:
                unet = create_unet(dtype=dtype, use_pallas_attention=pattn,
                                   **infer_unet_kwargs(variables))
            except (KeyError, ValueError, AttributeError) as e:
                print(f"[warn] UNet geometry inference failed ({e}); using reference defaults",
                      file=sys.stderr)
                unet = create_unet(dtype=dtype, use_pallas_attention=pattn)
        else:
            print(f"[warn] UNet checkpoint not found at {path!r}; using random init", file=sys.stderr)
            unet = create_unet(dtype=dtype, use_pallas_attention=pattn)
            variables = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 32, 32)), jnp.zeros((1,)))
        # standardize bounds travel with the checkpoint (sidecar json written
        # by spectrogram_train --mel_bounds auto); reference constants otherwise
        bounds = load_mel_bounds(path)
        from ..purify.spec import REF_MEL_BOUNDS

        if tuple(bounds) != REF_MEL_BOUNDS:
            print(f"[info] Diffusion-Spec standardize bounds from sidecar: {bounds}", file=sys.stderr)
        defender = RevImprovedDiffusionPurifier(
            lambda x, t: unet.apply(variables, x, t), t=args.t, sample_step=args.sample_step,
            rand_t=args.rand_t, t_delta=args.t_delta, mel_bounds=bounds,
        )
        return defender, "spec", True
    if name in ("AS", "MS", "AT"):
        from ..transforms import TimeDomainDefense

        d = TimeDomainDefense(name)
        return d, "wave", d.stochastic
    if name in ("DS", "LPF", "BPF"):
        from ..transforms import FreqDomainDefense

        return FreqDomainDefense(name), "wave", False
    if name == "FeCo":
        from ..transforms import FeCo

        return FeCo(param=0.2), "wave", False
    raise NotImplementedError(f"Unknown defense: {name}!")


def build_system(args, classifier_apply, n_mels: int = 32):
    defender, defense_type, stochastic = build_defender(args, n_mels)
    transform = None if args.classifier_model == "m5" else Wave2Spect(n_mels=n_mels)
    system = AcousticSystem(classifier_apply, transform, defender, defense_type, defender_stochastic=stochastic)
    return system


def build_attacker(args, system, model_fn=None):
    """The 5 attack choices (adaptive_attack_eval.py:181-231).

    ``model_fn`` overrides the default defended-forward closure — e.g.
    adv_finetune passes a state-aware fn (x, rng, params, batch_stats) so the
    attacker sees LIVE weights each batch without retracing."""
    from ..attacks import AudioAttack, FAKEBOB, Kenansville, PsychoacousticMasker, SirenAttack

    if model_fn is None:
        model_fn = lambda x, rng: system(x, rng, defend=True)
    if args.attack == "CW":
        return AudioAttack(
            model_fn,
            eps=args.eps,
            norm=args.bound_norm,
            max_iter_1=args.max_iter_1,
            max_iter_2=0,
            learning_rate_1=args.eps / 5 if args.bound_norm == "linf" else args.eps / 50,
            eot_attack_size=args.eot_attack_size,
            eot_defense_size=args.eot_defense_size,
            verbose=args.verbose,
            fused_stage_1=bool(getattr(args, "fused_stage_1", False)),
            fused_stage_2=bool(getattr(args, "fused_stage_2", False)),
        )
    if args.attack == "Qin-I":
        return AudioAttack(
            model_fn,
            masker=PsychoacousticMasker(),
            eps=args.eps,
            norm=args.bound_norm,
            max_iter_1=args.max_iter_1,
            max_iter_2=args.max_iter_2,
            learning_rate_1=args.eps / 5,
            verbose=args.verbose,
            fused_stage_1=bool(getattr(args, "fused_stage_1", False)),
            fused_stage_2=bool(getattr(args, "fused_stage_2", False)),
        )
    if args.attack == "Kenansville":
        # ssa is the reference eval default (adaptive_attack_eval.py:219-224);
        # fused_loop only applies to the fft variant (ssa is host-SVD-bound)
        return Kenansville(model_fn, atk_name=getattr(args, "kenan_variant", "ssa"),
                           max_iter=30, raster_width=100,
                           verbose=args.verbose, batch_size=args.batch_size,
                           fused_loop=bool(getattr(args, "fused_loop", False)))
    if args.attack == "FAKEBOB":
        # reference budget 200 iters x 200 draws (adaptive_attack_eval.py:209-218);
        # --bb_max_iter/--bb_samples_per_draw scale it down for heavy defended
        # chains (the artifact records the scaling)
        it = getattr(args, "bb_max_iter", None) or 200
        spd = getattr(args, "bb_samples_per_draw", None) or 200
        return FAKEBOB(model_fn, task="SCR", targeted=False, verbose=args.verbose,
                       confidence=0.5, epsilon=0.002, max_lr=5e-4, min_lr=1e-4, max_iter=it,
                       samples_per_draw=spd, samples_per_draw_batch_size=spd, batch_size=args.batch_size,
                       fused_loop=bool(getattr(args, "fused_loop", False)))
    if args.attack == "SirenAttack":
        # reference budget 300 epochs x 30 iters x 25 particles (:219-227)
        ep = getattr(args, "bb_max_epoch", None) or 300
        it = getattr(args, "bb_max_iter", None) or 30
        np_ = getattr(args, "bb_n_particles", None) or 25
        return SirenAttack(model_fn, task="SCR", targeted=False, verbose=args.verbose,
                           batch_size=args.batch_size, epsilon=0.002, max_epoch=ep, max_iter=it, n_particles=np_,
                           fused_loop=bool(getattr(args, "fused_loop", False)))
    raise AttributeError(f"this version does not support '{args.attack}' at present")
