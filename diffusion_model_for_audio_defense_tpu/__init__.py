"""TPU-native framework for diffusion-based audio adversarial defense.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
PyTorch stack (diffusion purification of audio, adaptive white/black-box
attacks, randomized-smoothing certification), built TPU-first:

- every model is a pure function ``apply(params, x, ...) -> y`` (Flax linen)
- diffusion reverse loops are ``jax.lax.scan`` (differentiable, remat-able)
- randomized smoothing shards the noise-draw axis over a ``jax.sharding.Mesh``
  with ``shard_map`` + ``psum`` (replaces the reference's host-level
  one-process-per-GPU sharding, scripts/parallel_certified_robust_eval.sh)
- explicit PRNG keys everywhere (replaces global CUDA RNG)

Subpackages
-----------
core      schedules, sharding/mesh, RNG discipline, checkpoint IO, config
ops       DSP: STFT/mel (torchaudio-slaney parity), filters, resample, SSA,
          kmeans, Pallas kernels
models    WaveNet (DiffWave), improved-diffusion UNet, M5, ConvNets zoo,
          RCNN-KWS
purify    DDPM / VP-SDE purifiers (wave + spectrogram domains)
attacks   PGD/CW + EOT, Qin psychoacoustic, NES, FAKEBOB, SirenAttack,
          Kenansville, BPDA
certify   randomized-smoothing certification (the north-star kernel)
parallel  device meshes, data sharding, collective helpers
data      SC09 / SpeechCommands / Qualcomm-KWS datasets, wav IO, augmentation
train     purifier + classifier training loops (pjit update steps, EMA)
cli       flag-compatible drivers mirroring the reference entry points
"""

__version__ = "0.1.0"

from . import core, ops  # noqa: F401
