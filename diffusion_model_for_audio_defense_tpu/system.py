"""AcousticSystem — the single composition seam every attack sees.

Rebuild of ``acoustic_system.py:3-50``: defender → transform → classifier as
one pure callable ``system(x, rng, defend) -> logits``. In the reference this
is an ``nn.Module`` whose autograd graph is what makes adaptive attacks
possible; here the same property holds because every stage is a traced JAX
function — ``jax.grad`` differentiates through the purifier scan.

Conventions:
- ``x``: waveform ``(B, 1, 16000)`` float32 (int16-scaled inputs are rescaled
  by 2^-15 like the reference guard at ``acoustic_system.py:29-30``)
- ``defend``: python bool (static — selects which graph is traced)
- ``rng`` feeds the (stochastic) defender; pass ``None`` for deterministic
  defenders or ``defend=False``.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp


class AcousticSystem:
    def __init__(
        self,
        classifier: Callable[[jnp.ndarray], jnp.ndarray],
        transform: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
        defender: Optional[Callable] = None,
        defense_type: str = "wave",
        defender_stochastic: bool = True,
    ):
        if defense_type not in ("wave", "spec"):
            raise NotImplementedError("argument defense_type should be 'wave' or 'spec'!")
        self.classifier = classifier
        self.transform = transform
        self.defender = defender
        self.defense_type = defense_type
        self.defender_stochastic = defender_stochastic

    def _run_defender(self, x, rng):
        if self.defender_stochastic:
            if rng is None:
                raise ValueError("stochastic defender requires an rng key")
            return self.defender(x, rng)
        return self.defender(x)

    def __call__(self, x: jnp.ndarray, rng=None, defend: bool = True) -> jnp.ndarray:
        # int16 guard (reference acoustic_system.py:29-30), traced as a select
        is_int_scaled = jnp.logical_and(0.9 * jnp.max(x) > 1.0, 0.9 * jnp.min(x) < -1.0)
        x = jnp.where(is_int_scaled, x / (2.0**15), x)

        out = x
        if defend and self.defender is not None and self.defense_type == "wave":
            out = self._run_defender(out, rng)
        if self.transform is not None:
            out = self.transform(out)
        if defend and self.defender is not None and self.defense_type == "spec":
            out = self._run_defender(out, rng)
        return self.classifier(out)
