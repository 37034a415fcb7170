"""Production DiffWave training-step throughput: XLA vs differentiable
Pallas stack (full param grads), B=16 bf16 — the trainer seam
(DiffWaveTrainer(use_pallas=True)), including Adam update."""
import time

import jax, jax.numpy as jnp
import numpy as np
import optax

from diffusion_model_for_audio_defense_tpu.core import linear_schedule
from diffusion_model_for_audio_defense_tpu.models import WaveNet
from diffusion_model_for_audio_defense_tpu.train.diffwave import make_diffwave_train_step

B = 16
sched = linear_schedule(200)
model = WaveNet(dtype=jnp.bfloat16)
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 16000)), jnp.zeros((1, 1)))
opt = optax.adam(2e-4)
x = jax.random.normal(jax.random.PRNGKey(1), (B, 1, 16000)) * 0.1

def bench(apply_fn, label):
    step = make_diffwave_train_step(apply_fn, sched, opt, donate=False)
    o = opt.init(params)
    p, o, l = step(params, o, x, jax.random.PRNGKey(2))
    jax.block_until_ready(l)
    t0 = time.perf_counter()
    reps = 10
    for i in range(reps):
        p, o, l = step(p, o, x, jax.random.PRNGKey(3 + i))
    jax.block_until_ready(l)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label}: {ms:.1f} ms/step = {B/ms*1e3:.1f} utt/s  (loss {float(l):.4f})", flush=True)
    return ms

ms_p = bench(lambda p, xx, t: __import__(
    "diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_stack", fromlist=["w"]
).wavenet_apply_stack(p, xx, t, differentiable=True), "pallas train step")
ms_x = bench(lambda p, xx, t: model.apply(p, xx, t), "xla train step")
print(f"speedup: {ms_x/ms_p:.2f}x")
