"""Honest device timing through the axon tunnel.

**Pitfall (round 3 discovery)**: through axon's remote PJRT,
``jax.block_until_ready`` returns WITHOUT waiting for device execution —
only an actual host fetch (``float(...)`` / ``np.asarray``) synchronizes.
The classic ``for _ in range(n): out = fn(x); block_until_ready(out)``
loop therefore measures dispatch (+ occasional queue backpressure), not
execution: a 0.9 ms ResBlock "measured" 0.05 ms that way. A scalar fetch
costs ~30 ms RTT, so per-call sync-timing is also useless.

The fix: run k dependent executions inside ONE jitted ``fori_loop``,
fetch a scalar reduction of the result, and take the slope between two
chain lengths — RTT and one-time costs cancel.

    per_exec = timed_chain(step, x0)           # step: x -> x-like
    per_exec = timed_chain(step, x0, k_hi=32)  # longer chain, less noise
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from diffusion_model_for_audio_defense_tpu.core.functional import jit_hoisted


def timed_chain(step, x0, *, k_lo: int = 2, k_hi: int = 18, reps: int = 3,
                label: str | None = None) -> float:
    """Seconds per execution of ``step`` (an x → x-structured device fn;
    x may be a pytree, e.g. a train state chained through its own step).

    Chains ``k`` dependent calls in one jit and times a scalar fetch;
    returns the slope between ``k_lo`` and ``k_hi`` chains (min over
    ``reps``), which cancels the ~30 ms axon fetch RTT.
    """
    def tree_scalar(t):
        return jax.tree_util.tree_reduce(
            lambda a, l: a + jnp.sum(l.astype(jnp.float32)), t, jnp.float32(0))

    fns = {}
    for k in (k_lo, k_hi):
        # jit_hoisted (not jax.jit): step's closure-captured params would
        # otherwise bake into the HLO as literals — big graphs then exceed
        # the axon remote-compile upload limit (HTTP 413).
        fns[k] = jit_hoisted(lambda x, k=k: tree_scalar(
            jax.lax.fori_loop(0, k, lambda i, h: step(h), x)))
        float(fns[k](x0))  # compile + warm
    best = {}
    for k in (k_lo, k_hi):
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(fns[k](x0))
            ts.append(time.time() - t0)
        best[k] = min(ts)
    per = (best[k_hi] - best[k_lo]) / (k_hi - k_lo)
    if label:
        print(f"  {label}: {per*1e3:.2f} ms/exec "
              f"(k{k_lo}={best[k_lo]*1e3:.0f}ms k{k_hi}={best[k_hi]*1e3:.0f}ms)",
              flush=True)
    return per


def timed_fetch(fn, *args, reps: int = 3) -> float:
    """Seconds for one execution + scalar fetch (includes ~30 ms RTT).

    For graphs that can't be chained (shape-changing); subtract a
    calibration ``timed_fetch(lambda: jnp.float32(0))`` if RTT matters.
    """
    f = jit_hoisted(lambda *a: jnp.sum(jnp.asarray(fn(*a), jnp.float32)))
    float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(f(*args))
        ts.append(time.time() - t0)
    return min(ts)
