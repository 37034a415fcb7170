"""Timestep respacing (reference ``improved_diffusion/respace.py``).

``space_timesteps`` supports section counts and the ``ddimN`` stride
notation; ``SpacedDiffusion`` re-derives betas over the kept subsequence and
maps model timesteps back to the original indices.
"""

from __future__ import annotations

import numpy as np

from .diffusion_math import GaussianDiffusion


def space_timesteps(num_timesteps: int, section_counts):
    """Reference ``respace.py:7-61``."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim") :])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired:
                    return set(range(0, num_timesteps, i))
            raise ValueError(f"cannot create exactly {desired} steps with an integer stride")
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps = []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(f"cannot divide section of {size} steps into {section_count}")
        frac_stride = 1 if section_count <= 1 else (size - 1) / (section_count - 1)
        cur_idx = 0.0
        taken_steps = []
        for _ in range(section_count):
            taken_steps.append(start_idx + round(cur_idx))
            cur_idx += frac_stride
        all_steps += taken_steps
        start_idx += size
    return set(all_steps)


class SpacedDiffusion(GaussianDiffusion):
    """GaussianDiffusion over a subsequence of timesteps
    (reference ``respace.py:63-122``)."""

    def __init__(self, use_timesteps, betas, **kwargs):
        self.use_timesteps = set(use_timesteps)
        self.original_num_steps = len(betas)

        last_alpha_cumprod = 1.0
        new_betas = []
        self.timestep_map = []
        # float64 schedule precompute like the reference (its base
        # GaussianDiffusion keeps f64 alphas_cumprod; reading back our f32
        # device tables here cost ~1e-5 relative error in the respaced betas
        # — caught by the oracle against the real respace.SpacedDiffusion)
        acp = np.cumprod(1.0 - np.asarray(betas, dtype=np.float64))
        for i in range(len(betas)):
            if i in self.use_timesteps:
                new_betas.append(1 - acp[i] / last_alpha_cumprod)
                last_alpha_cumprod = acp[i]
                self.timestep_map.append(i)
        super().__init__(betas=np.asarray(new_betas), **kwargs)
        self._map = np.asarray(self.timestep_map)

    def wrap_model(self, model_fn):
        """Map spaced timesteps to original-model timesteps
        (reference ``_WrappedModel``)."""
        import jax.numpy as jnp

        tmap = jnp.asarray(self._map)
        scale = 1000.0 / self.original_num_steps

        def wrapped(x, t, *args, **kwargs):
            new_t = tmap[t.astype(jnp.int32)]
            if self.rescale_timesteps:
                new_t = new_t.astype(jnp.float32) * scale
            return model_fn(x, new_t, *args, **kwargs)

        return wrapped

    # sampling/losses call model_fn(x, scaled_t); with respacing the model
    # must be wrapped. Override _scale_t to avoid double rescaling.
    def _scale_t(self, t):
        return t  # the wrapper handles mapping + rescaling
