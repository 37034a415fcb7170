"""Smoke tests for perf/_timing.timed_chain (the honest-timing tool every
quoted perf number now depends on). On CPU real synchronization works, so
these only guard the mechanics: chain construction, pytree carries, and a
sane (non-negative, finite) slope."""

import importlib.util
import pathlib

import jax
import jax.numpy as jnp

_spec = importlib.util.spec_from_file_location(
    "_timing", pathlib.Path(__file__).parent.parent / "perf" / "_timing.py")
_timing = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_timing)


def test_timed_chain_array_carry():
    x = jnp.ones((64, 64))
    per = _timing.timed_chain(lambda h: h @ h * 1e-3 + 1.0, x, k_lo=2, k_hi=6, reps=2)
    assert isinstance(per, float)
    assert per == per and per < 10.0  # finite, not absurd


def test_timed_chain_pytree_carry():
    s0 = {"a": jnp.ones((8, 8)), "b": jnp.zeros((3,))}

    def step(s):
        return {"a": s["a"] * 0.999 + 0.001, "b": s["b"] + jnp.sum(s["a"]) * 1e-6}

    per = _timing.timed_chain(step, s0, k_lo=2, k_hi=5, reps=2)
    assert isinstance(per, float) and per == per


def test_timed_fetch_runs():
    d = _timing.timed_fetch(lambda v: v * 2.0, jnp.ones((16,)), reps=2)
    assert isinstance(d, float) and d > 0
