"""Measure VPU throughput of the WaveNet gate (tanh*sigmoid) and friends.

Grid loops over resident VMEM tiles so the numbers are compute, not DMA.
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, Ccol = 1024, 512  # tile: 1024 rows x 512 lanes
REPS_IN_KERNEL = 64


def _gate_kernel(a_ref, b_ref, o_ref, *, op, in_dtype):
    a = a_ref[:].astype(in_dtype)
    b = b_ref[:].astype(in_dtype)

    def body(i, acc):
        fi = i.astype(in_dtype)
        if op == "gate":
            return acc + jnp.tanh(a + fi) * jax.nn.sigmoid(b - fi)
        if op == "tanh":
            return acc + jnp.tanh(a + fi)
        if op == "sigmoid":
            return acc + jax.nn.sigmoid(b - fi)
        if op == "mul_add":
            return acc + (a + fi) * (b - fi)
        if op == "exp":
            return acc + jnp.exp(a - fi)
        raise ValueError(op)

    acc = jax.lax.fori_loop(0, REPS_IN_KERNEL, body, jnp.zeros_like(a))
    o_ref[:] = acc.astype(o_ref.dtype)


def run(op, dtype, in_dtype):
    a = jax.random.normal(jax.random.PRNGKey(0), (R, Ccol), dtype)
    b = jax.random.normal(jax.random.PRNGKey(1), (R, Ccol), dtype)
    f = pl.pallas_call(
        functools.partial(_gate_kernel, op=op, in_dtype=in_dtype),
        out_shape=jax.ShapeDtypeStruct((R, Ccol), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    f = jax.jit(f)
    jax.block_until_ready(f(a, b))
    t0 = time.perf_counter()
    n = 50
    for _ in range(n):
        out = f(a, b)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    els = R * Ccol * REPS_IN_KERNEL
    print(f"{op:8s} data={str(dtype.__name__ if hasattr(dtype,'__name__') else dtype):9s} "
          f"compute={in_dtype.__name__:9s}: {els/dt/1e9:7.1f} Gelem/s  ({dt*1e6:.0f} us/call)")
    return els / dt


def main():
    for op in ("mul_add", "tanh", "sigmoid", "gate", "exp"):
        run(op, jnp.float32, jnp.float32)
        run(op, jnp.bfloat16, jnp.bfloat16)
        run(op, jnp.bfloat16, jnp.float32)

    # context: per WaveNet block the gate touches B*L*C = 64*16000*256 elements
    print("\nper-block gate elements:", 64 * 16000 * 256 / 1e6, "M")


if __name__ == "__main__":
    main()
