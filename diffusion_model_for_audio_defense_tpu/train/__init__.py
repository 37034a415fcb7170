from .diffwave import (  # noqa: F401
    DiffWaveTrainer,
    diffwave_loss,
    make_diffwave_train_step,
    wavenet_param_sharding,
)
from .classifier import ClassifierTrainer, pgd_attack_waveform  # noqa: F401
from .improved_diffusion import TrainLoop  # noqa: F401
from .ema import ema_update, init_ema  # noqa: F401
from .resample_t import (  # noqa: F401
    LossSecondMomentResampler,
    UniformSampler,
    create_named_schedule_sampler,
)
from . import logger  # noqa: F401
