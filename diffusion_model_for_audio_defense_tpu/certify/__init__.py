from .smoothing import (  # noqa: F401
    clopper_pearson_lower,
    make_smoothed_counts_fn,
    RandomizedSmoothing,
)
