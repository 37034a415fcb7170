"""Lab 15: where do the UNet's cycles go? (spec-domain perf, round 3+)

lab13 measured the production UNet forward at 46.1 ms bf16 B=256 — ~28% MXU
utilization vs the WaveNet stack's 95%. This lab (1) captures a device trace
of the forward and aggregates op-type durations from trace.json.gz, and
(2) A/B-tests candidate variants:

  - baseline create_unet(dtype=bf16)
  - attention via jax.nn.dot_product_attention (XLA flash path) vs einsum
  - optimization_barrier after each down-level (skip-buffer pressure, the
    WaveNet trick from round 1)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python perf/lab15_unet_trace.py
"""
import glob
import gzip
import json
import os
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

from diffusion_model_for_audio_defense_tpu.core.functional import jit_hoisted
from diffusion_model_for_audio_defense_tpu.models.unet import create_unet
from diffusion_model_for_audio_defense_tpu.train.logger import device_trace

B = 256


def bench(name, fn, *args, n=20):
    t0 = time.time()
    jax.block_until_ready(fn(*args))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name}: {dt*1e3:.2f} ms (compile {compile_s:.0f}s) -> {B/dt:.0f} spec/s", flush=True)
    return dt


def aggregate_trace(logdir):
    files = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True)
    if not files:
        print("no trace.json.gz found"); return
    with gzip.open(sorted(files)[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])
    # keep complete events on TPU device tracks, bucket by name prefix
    buckets = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "")
        if name.startswith(("fusion", "convolution", "copy", "loop_", "dot",
                            "all-reduce", "reshape", "transpose", "custom-call",
                            "dynamic", "scatter", "select", "broadcast", "slice")):
            key = name.split(".")[0].rstrip("0123456789_")
            buckets[key] += e["dur"]
            total += e["dur"]
    print(f"\n-- trace op buckets ({total/1e3:.1f} ms total traced) --")
    for k, v in sorted(buckets.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {k:40s} {v/1e3:8.2f} ms  {100*v/max(total,1e-9):5.1f}%")


def main():
    spec = jax.random.normal(jax.random.PRNGKey(0), (B, 1, 32, 32))
    t = jnp.zeros((B,))

    unet = create_unet(dtype=jnp.bfloat16)
    variables = unet.init(jax.random.PRNGKey(1), spec[:1], t[:1])
    fwd = jit_hoisted(lambda s, tt, v=variables: unet.apply(v, s, tt))
    dt = bench("unet fwd bf16 baseline", fwd, spec, t)

    logdir = "/tmp/lab15_trace"
    jax.block_until_ready(fwd(spec, t))
    with device_trace(logdir):
        for _ in range(5):
            out = fwd(spec, t)
        jax.block_until_ready(out)
    aggregate_trace(logdir)


if __name__ == "__main__":
    main()
