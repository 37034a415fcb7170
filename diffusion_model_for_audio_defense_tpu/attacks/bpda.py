"""Backward-Pass Differentiable Approximation (BPDA).

Rebuild of ``robustness_eval/_BPDA.py``: forward runs the (possibly
non-differentiable) ``ori_f``; backward differentiates the substitute
``sub_f``. In JAX this is a ``jax.custom_vjp`` — three lines instead of a
torch ``autograd.Function`` with arg introspection.

Example (quantization defense): ``qt_diff = bpda(quantize, lambda x: x)``.
"""

from __future__ import annotations

import jax


def bpda(ori_f, sub_f=None):
    """Return a function computing ``ori_f`` forward, ``sub_f`` gradients.

    ``sub_f`` defaults to identity (straight-through estimator).
    """
    sub_f = sub_f if sub_f is not None else (lambda *args: args[0] if len(args) == 1 else args)

    @jax.custom_vjp
    def f(*args):
        return ori_f(*args)

    def fwd(*args):
        return ori_f(*args), args

    def bwd(args, g):
        _, vjp = jax.vjp(sub_f, *args)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f
