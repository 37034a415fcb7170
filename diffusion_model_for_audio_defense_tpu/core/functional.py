"""Jit helpers: hoist closure-captured arrays out of compiled programs.

A jnp array captured by closure lowers as an HLO *literal constant*: the
weights get serialized into the program (the production WaveNet's ~80 MB of
f32 params), the axon remote-compile tunnel uploads them with every
executable, and XLA spends minutes constant-folding around them. Measured on
v5e-1: a closure-baked WaveNet forward compiles in **266 s**, the identical
function with params as arguments in **23 s** — same 73 ms steady state.
Worse, big graphs (spec-domain attack grads) exceed the tunnel's upload
limit outright (HTTP 413: ~570 MB of HLO, 2.3 MB once hoisted).

``jit_hoisted(fn)`` is a drop-in ``jax.jit`` replacement: on first call per
input signature it traces ``fn`` to a jaxpr, pulls the jaxpr's array
constants (model params, schedule tables, mel filterbanks) out as ordinary
runtime arguments, and jits the de-constanted program. (``jax.closure_convert``
only hoists *tracer* consts — concrete closure captures stay baked — hence
the manual jaxpr surgery here.)
"""

from __future__ import annotations

import jax

# consts at or below this many elements stay baked: tiny tables are
# harmless, and literal scalars/iotas sometimes must stay constants
_HOIST_MIN_SIZE = 1024

# pallas graphs prefer baked consts (see _has_pallas), but ONLY while the
# baked program still fits through the axon remote-compile tunnel: past this
# many const bytes we hoist anyway — a slower compile beats an HTTP 413
# (round-5 failure: the Diffusion-Spec attack graph with the Pallas
# attention kernel auto-fell back to baked and exceeded the upload limit)
_PALLAS_BAKE_MAX_BYTES = 64 * 1024 * 1024


def _signature(args):
    leaves, treedef = jax.tree.flatten(args)
    return treedef, tuple(
        (getattr(l, "shape", None), str(getattr(l, "dtype", type(l).__name__)))
        if hasattr(l, "shape") or hasattr(l, "dtype")
        else ("py", repr(l))
        for l in leaves
    )


def _has_pallas(jaxpr, _depth=0):
    """True if any (nested) eqn is a pallas_call — those graphs compile
    FASTER with weights baked (the consts feed an opaque kernel, so XLA does
    no constant-folding on them; hoisting measured 349 s vs 265 s baked on
    the production attack graph). Sub-jaxprs appear either as ClosedJaxpr
    params (``.jaxpr``) or as raw Jaxpr params (``.eqns`` — e.g. remat2 and
    shard_map), so both spellings are recursed."""
    if _depth > 12:
        return False

    def _sub(v):
        if hasattr(v, "jaxpr"):  # ClosedJaxpr (scan, cond, pjit, ...)
            return v.jaxpr
        if hasattr(v, "eqns"):  # raw Jaxpr (remat2, shard_map, ...)
            return v
        return None

    for eqn in jaxpr.eqns:
        if "pallas" in eqn.primitive.name:
            return True
        for v in eqn.params.values():
            vs = v if isinstance(v, (list, tuple)) else (v,)
            for vv in vs:
                sub = _sub(vv)
                if sub is not None and _has_pallas(sub, _depth + 1):
                    return True
    return False


def _convert(fn, *example_args):
    """Trace fn, hoist large array consts; returns (jitted_flat, hoisted,
    in_tree, out_tree). Graphs containing Pallas kernels keep every const
    baked (see ``_has_pallas``) but still reuse the single trace."""
    import jax.core as jcore

    flat_ex, in_tree = jax.tree.flatten(example_args)
    out_store = {}

    def flat_fn(*flat_args):
        out = fn(*jax.tree.unflatten(in_tree, flat_args))
        flat_out, out_tree = jax.tree.flatten(out)
        out_store["tree"] = out_tree
        return flat_out

    closed = jax.make_jaxpr(flat_fn)(*flat_ex)
    const_bytes = sum(
        getattr(c, "nbytes", 0) for c in closed.consts
        if hasattr(c, "shape") and getattr(c, "size", 0) > _HOIST_MIN_SIZE
    )
    if _has_pallas(closed.jaxpr) and const_bytes <= _PALLAS_BAKE_MAX_BYTES:
        # baked-consts path, but REUSE the jaxpr we already traced (a plain
        # jax.jit(fn) would trace the whole graph a second time — the
        # production certify chain costs ~seconds per trace). Graphs whose
        # consts exceed _PALLAS_BAKE_MAX_BYTES fall through to hoisting even
        # with pallas_calls present: the baked HLO would 413 the tunnel.
        def run_baked(*flat_args):
            return jcore.eval_jaxpr(closed.jaxpr, closed.consts, *flat_args)

        return jax.jit(run_baked), (), in_tree, out_store["tree"]
    hoist_ix, hoisted, kept = [], [], []
    for i, c in enumerate(closed.consts):
        if hasattr(c, "shape") and getattr(c, "size", 0) > _HOIST_MIN_SIZE:
            hoist_ix.append(i)
            hoisted.append(c)
        else:
            kept.append((i, c))

    n_args = len(flat_ex)

    def run(*flat_all):
        flat_args = flat_all[:n_args]
        hs = flat_all[n_args:]
        consts = [None] * len(closed.consts)
        for j, i in enumerate(hoist_ix):
            consts[i] = hs[j]
        for i, c in kept:
            consts[i] = c
        return jcore.eval_jaxpr(closed.jaxpr, consts, *flat_args)

    return jax.jit(run), tuple(hoisted), in_tree, out_store["tree"]


def jit_hoisted(fn):
    """``jax.jit`` with closure-captured arrays hoisted to arguments.

    Call like the original function; the first call per argument signature
    pays one abstract trace to discover the captured arrays, then reuses the
    converted jitted program (a dict lookup per call thereafter).
    """
    cache = {}

    def wrapped(*args):
        key = _signature(args)
        entry = cache.get(key)
        if entry is None:
            entry = _convert(fn, *args)
            cache[key] = entry
        jitted, hoisted, in_tree, out_tree = entry
        flat_args = jax.tree.leaves(args)
        out_flat = jitted(*flat_args, *hoisted)
        return jax.tree.unflatten(out_tree, out_flat)

    wrapped._cache = cache  # introspectable (tested)
    return wrapped


def enable_compilation_cache(path=None):
    """Turn on JAX's persistent compilation cache (verified to work through
    the axon remote-compile tunnel): the production Pallas attack graph
    costs ~265 s to compile once, ~3 s from cache in a fresh process.
    Default location ``~/.cache/diffusion_model_for_audio_defense_tpu/jax``;
    override with ``DMAD_COMPILE_CACHE`` or disable with
    ``DMAD_NO_COMPILE_CACHE=1``. Only programs that took >10 s to compile
    are persisted."""
    import os

    if os.environ.get("DMAD_NO_COMPILE_CACHE"):
        return None
    path = path or os.environ.get(
        "DMAD_COMPILE_CACHE",
        os.path.expanduser("~/.cache/diffusion_model_for_audio_defense_tpu/jax"),
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:  # unwritable dir / unsupported backend: run uncached
        return None
    return path
