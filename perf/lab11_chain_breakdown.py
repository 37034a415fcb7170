import time, jax, jax.numpy as jnp
from diffusion_model_for_audio_defense_tpu.models import WaveNet, resnext29_8_64
from diffusion_model_for_audio_defense_tpu.ops import Wave2Spect
from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_stack import wavenet_apply_stack

B = 128
wn = WaveNet(dtype=jnp.bfloat16)
wv = wn.init(jax.random.PRNGKey(0), jnp.zeros((1,1,16000)), jnp.zeros((1,1)))
clf = resnext29_8_64(num_classes=10, dtype=jnp.bfloat16)
cv = clf.init(jax.random.PRNGKey(1), jnp.zeros((1,1,32,32)))
w2s = Wave2Spect(n_mels=32)
x = jax.random.normal(jax.random.PRNGKey(2), (B,1,16000)) * 0.1
t = jnp.full((B,1), 25.0)

def timeit(f, *a):
    f(*a).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5): r = f(*a)
    r.block_until_ready()
    return (time.perf_counter()-t0)/5*1e3

f_wn = jax.jit(lambda x: wavenet_apply_stack(wv, x, t))
f_all = jax.jit(lambda x: clf.apply(cv, w2s(wavenet_apply_stack(wv, x, t))))
ms_wn = timeit(f_wn, x); print(f"wavenet-only B={B}: {ms_wn:.1f} ms", flush=True)
ms_all = timeit(f_all, x); print(f"full chain B={B}: {ms_all:.1f} ms | non-wavenet {(ms_all-ms_wn):.1f} ms = {(ms_all-ms_wn)/ms_all*100:.1f}%")
