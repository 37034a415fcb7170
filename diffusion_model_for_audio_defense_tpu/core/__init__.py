from .schedules import (  # noqa: F401
    DiffusionSchedule,
    linear_schedule,
    cosine_schedule,
    vpsde_schedule,
    compute_t_star,
)
from . import rng  # noqa: F401
from .functional import jit_hoisted  # noqa: F401
