"""core.functional.jit_hoisted: closure constants become runtime args."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_model_for_audio_defense_tpu.core.functional import _convert, jit_hoisted


def test_hoisted_matches_jit_and_shrinks_program(rng_np):
    w = jnp.asarray(rng_np.standard_normal((2048, 8)).astype(np.float32))
    b = jnp.asarray(rng_np.standard_normal((8,)).astype(np.float32))
    f = lambda x: jnp.tanh(x @ w + b)
    x = jnp.asarray(rng_np.standard_normal((4, 2048)).astype(np.float32))
    hf = jit_hoisted(f)
    np.testing.assert_allclose(np.asarray(hf(x)), np.asarray(jax.jit(f)(x)), rtol=1e-6)
    jitted, hoisted, _, _ = _convert(f, x)
    # w (2048*8 elems) hoisted; b (8) stays baked (tiny)
    assert [h.shape for h in hoisted] == [(2048, 8)]
    baked = len(jax.jit(f).lower(x).as_text())
    small = len(jitted.lower(x, *hoisted).as_text())
    assert small < baked / 10, (baked, small)


def test_hoisted_pytree_in_out_and_cache(rng_np):
    w = jnp.asarray(rng_np.standard_normal((64, 64)).astype(np.float32) * 0.1)
    # needs >1024 elements to hoist
    f = lambda d: {"out": d["a"] @ w, "pair": (d["a"] + 1, d["a"].sum())}
    hf = jit_hoisted(f)
    a = jnp.ones((2, 64))
    r = hf({"a": a})
    assert set(r) == {"out", "pair"} and r["out"].shape == (2, 64)
    hf({"a": a})
    assert len(hf._cache) == 1  # signature reuse
    hf({"a": jnp.ones((3, 64))})
    assert len(hf._cache) == 2  # new shape -> new entry


def test_hoisted_through_grad_and_scan(rng_np):
    w = jnp.asarray(rng_np.standard_normal((2048, 2048)).astype(np.float32) * 0.01)

    def f(x):
        def body(h, _):
            return jnp.tanh(h @ w), None

        h, _ = jax.lax.scan(body, x, None, length=3)
        return h.sum()

    g = jit_hoisted(jax.grad(f))
    x = jnp.asarray(rng_np.standard_normal((2, 2048)).astype(np.float32))
    want = np.asarray(jax.grad(f)(x))
    np.testing.assert_allclose(np.asarray(g(x)), want, rtol=1e-5, atol=1e-6)
    # the scan-body const must be hoisted out of the program
    jitted, hoisted, _, _ = _convert(jax.grad(f), x)
    assert any(h.shape == (2048, 2048) for h in hoisted)


def test_hoisted_through_shard_map(rng_np):
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    mesh = Mesh(np.asarray(jax.devices()), ("dp",))
    w = jnp.asarray(rng_np.standard_normal((2048, 4)).astype(np.float32))

    def per_dev(x):
        return jax.lax.psum(x @ w, "dp")

    f = shard_map(per_dev, mesh=mesh, in_specs=P("dp"), out_specs=P(), check_vma=False)
    x = jnp.asarray(rng_np.standard_normal((8, 2048)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(jit_hoisted(f)(x)), np.asarray(jax.jit(f)(x)), rtol=1e-5)
    _, hoisted, _, _ = _convert(f, x)
    assert any(h.shape == (2048, 4) for h in hoisted)


def test_has_pallas_sees_through_checkpoint_scan_and_shard_map(rng_np):
    """The pallas-bake guard must detect kernels under remat2 (jax.checkpoint
    — every purifier wraps the ε-net this way) and shard_map (certify) whose
    eqn params are raw Jaxprs, not ClosedJaxprs."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    from diffusion_model_for_audio_defense_tpu.core.functional import _has_pallas
    from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_block import (
        fused_residual_block,
    )

    C = 8
    h = jnp.asarray(rng_np.standard_normal((1, 1024, C)).astype(np.float32) * 0.1)
    tb = jnp.zeros((1, C)); wd = jnp.zeros((3, C, 2 * C)); bd = jnp.zeros((2 * C,))
    wrs = jnp.zeros((C, 2 * C)); brs = jnp.zeros((2 * C,))

    def block(x):
        h2, _ = fused_residual_block(x, tb, wd, bd, wrs, brs, dilation=1,
                                     tile_l=1024, interpret=True)
        return h2

    def scanned_remat(x):
        body = jax.checkpoint(lambda c, _: (block(c), None))
        out, _ = jax.lax.scan(body, x, None, length=2)
        return out

    assert _has_pallas(jax.make_jaxpr(block)(h).jaxpr)
    assert _has_pallas(jax.make_jaxpr(scanned_remat)(h).jaxpr)

    mesh = Mesh(np.asarray(jax.devices()), ("dp",))
    sharded = shard_map(block, mesh=mesh, in_specs=P("dp"), out_specs=P("dp"),
                        check_vma=False)
    x8 = jnp.asarray(rng_np.standard_normal((8, 1024, C)).astype(np.float32) * 0.1)
    assert _has_pallas(jax.make_jaxpr(sharded)(x8).jaxpr)
    # and a pallas-free fn stays hoistable
    assert not _has_pallas(jax.make_jaxpr(lambda x: jnp.tanh(x) @ jnp.ones((C, C)))(h).jaxpr)


def test_pallas_graph_hoists_when_consts_exceed_bake_cap(rng_np, monkeypatch):
    """Pallas graphs normally keep consts baked (faster compile), but past
    _PALLAS_BAKE_MAX_BYTES the baked HLO exceeds the remote-compile upload
    limit (round-5 HTTP 413 on the Diffusion-Spec attack graph) — the guard
    must fall through to hoisting."""
    from diffusion_model_for_audio_defense_tpu.core import functional as F
    from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_block import (
        fused_residual_block,
    )

    C = 16  # wd has 6*C^2 = 1536 elements — above _HOIST_MIN_SIZE
    h = jnp.asarray(rng_np.standard_normal((1, 1024, C)).astype(np.float32) * 0.1)
    tb = jnp.zeros((1, C)); bd = jnp.zeros((2 * C,))
    wrs = jnp.zeros((C, 2 * C)); brs = jnp.zeros((2 * C,))
    wd = jnp.asarray(rng_np.standard_normal((3, C, 2 * C)).astype(np.float32) * 0.1)

    def f(x):
        h2, _ = fused_residual_block(x, tb, wd, bd, wrs, brs, dilation=1,
                                     tile_l=1024, interpret=True)
        return h2

    # default cap: pallas graph stays baked (no hoisted args)
    w1 = F.jit_hoisted(f)
    y1 = w1(h)
    (_, hoisted1, _, _), = w1._cache.values()
    assert hoisted1 == ()

    # cap below wd's nbytes: the same graph must hoist its large consts
    monkeypatch.setattr(F, "_PALLAS_BAKE_MAX_BYTES", 0)
    w2 = F.jit_hoisted(f)
    y2 = w2(h)
    (_, hoisted2, _, _), = w2._cache.values()
    assert len(hoisted2) >= 1
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-6)


def test_enable_compilation_cache(tmp_path, monkeypatch):
    from diffusion_model_for_audio_defense_tpu.core.functional import (
        enable_compilation_cache,
    )

    old = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.setenv("DMAD_NO_COMPILE_CACHE", "1")
        assert enable_compilation_cache() is None
        monkeypatch.delenv("DMAD_NO_COMPILE_CACHE")
        monkeypatch.setenv("DMAD_COMPILE_CACHE", str(tmp_path / "cache"))
        got = enable_compilation_cache()
        assert got == str(tmp_path / "cache")
        import os

        assert os.path.isdir(got)
    finally:  # the tmp dir dies with the test; don't leave jax pointed at it
        jax.config.update("jax_compilation_cache_dir", old)
