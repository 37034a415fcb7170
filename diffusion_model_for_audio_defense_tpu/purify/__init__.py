from .ddpm import (  # noqa: F401
    q_jump,
    ddpm_reverse,
    ddpm_purify,
    one_shot_denoise,
    two_shot_denoise,
    fast_reverse,
    predict_x0_from_eps,
    DiffWavePurifier,
    ReDiffWavePurifier,
)
from .sde import vpsde_purify, RevDiffWavePurifier  # noqa: F401
