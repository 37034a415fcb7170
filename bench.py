"""Benchmark: certified-robustness throughput on real TPU hardware.

Measures the north-star kernel (BASELINE.json): randomized-smoothing draws
through the full denoised-smoothing pipeline — x+δ → √ᾱ*· → DiffWave one-shot
denoise (production 256ch/36L WaveNet) → slaney mel → ResNeXt29 8×64 → argmax
counts — at σ=1.0, and converts to certified utterances/hour at N=100,000
draws per utterance. Model compute runs in bfloat16 (params f32); the
smoothing counts are argmax decisions, robust to bf16 activations.

Prints ONE JSON line:
  {"metric": "certified_utts_per_hr_N100k", "value": ..., "unit": "utt/hr",
   "vs_baseline": ...}

vs_baseline: the reference runs the same N=100k loop serially in PyTorch on
one GPU (certified_robust.py:34-67, batch 50) and publishes no wall-clock
numbers (BASELINE.md). Denominator = a compute-grounded estimate of that
loop on an A100: ~0.6 TFLOP per draw (WaveNet one-shot + mel + ResNeXt) at
~40% TF32 utilization (62 TF/s) ≈ 100 draws/s → 3.6 utt/hr at N=100k.
BASELINE.json's target is ≥20× on a v5e-8; this harness exposes one chip, so
the recorded number is per-chip (multiply by 8 for the pod figure — the
draws axis shards embarrassingly via shard_map/psum, see certify/).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_GPU_UTTS_PER_HR = 3.6  # documented estimate, see module docstring


def main():
    from diffusion_model_for_audio_defense_tpu.core.functional import enable_compilation_cache

    enable_compilation_cache()  # certify graph: ~5 min compile once, ~s cached
    from diffusion_model_for_audio_defense_tpu.certify import make_smoothed_counts_fn
    from diffusion_model_for_audio_defense_tpu.core import compute_t_star, linear_schedule
    from diffusion_model_for_audio_defense_tpu.models import WaveNet, resnext29_8_64
    from diffusion_model_for_audio_defense_tpu.ops import Wave2Spect
    from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_stack import wavenet_apply_stack

    sched = linear_schedule(200)
    wavenet = WaveNet(dtype=jnp.bfloat16)
    wn_vars = wavenet.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 16000)), jnp.zeros((1, 1)))
    clf = resnext29_8_64(num_classes=10, dtype=jnp.bfloat16)
    clf_vars = clf.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 32, 32)))

    # fused Pallas residual-stack forward: ~1.9x the XLA WaveNet on v5e
    eps_fn = lambda x, t: wavenet_apply_stack(wn_vars, x, t[:, None])
    classifier = lambda s: clf.apply(clf_vars, s)

    batch = 128  # swept 64/128/256 on v5e: 128 best (10.35 vs 10.24 utt/hr)
    counts_fn = make_smoothed_counts_fn(
        classifier, Wave2Spect(n_mels=32), eps_fn, sched, num_classes=10, batch_size=batch
    )

    sigma = 1.0
    abar_star = 1.0 / (1.0 + sigma**2)
    t_star = compute_t_star(sched, sigma)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 16000)) * 0.1

    n_bench = 4096
    # warmup/compile. Sync via a host fetch of the (tiny) counts vector:
    # through axon's remote PJRT, block_until_ready does NOT wait for device
    # execution — only an actual transfer does (perf/_timing.py). The ~30 ms
    # fetch RTT is noise on a ~14 s call.
    np.asarray(counts_fn(x, sigma, t_star, abar_star**0.5, n_bench, jax.random.PRNGKey(3)))
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        np.asarray(counts_fn(x, sigma, t_star, abar_star**0.5, n_bench, jax.random.PRNGKey(4 + i)))
    dt = (time.perf_counter() - t0) / reps

    draws_per_sec = n_bench / dt
    utts_per_hr = draws_per_sec * 3600.0 / 100_000.0
    print(
        json.dumps(
            {
                "metric": "certified_utts_per_hr_N100k",
                "value": round(utts_per_hr, 2),
                "unit": "utt/hr",
                "vs_baseline": round(utts_per_hr / REFERENCE_GPU_UTTS_PER_HR, 2),
            }
        )
    )


def _supervise() -> int:
    """Run the bench body in fresh subprocesses with retry + backoff.

    Round 3's BENCH died rc=1 at axon backend init (`UNAVAILABLE`) with no
    retry — but a stale-client wedge is transient by nature: a fresh process
    typically succeeds once it clears. The supervisor process NEVER touches
    the backend itself; each attempt is a new interpreter (new axon client),
    output streams through live (no capture buffering), and a watchdog
    bounds every attempt. On final failure it still prints a diagnostic
    JSON line so the driver always records *something* (the reference's
    only perf harness, DiffWave_Unconditional/inference.py:69-80, always
    produced a number; so must we).
    """
    import os
    import subprocess
    import sys

    attempts = int(os.environ.get("DMAD_BENCH_ATTEMPTS", "3"))
    watchdog = int(os.environ.get("DMAD_BENCH_TIMEOUT", "2400"))
    probe_timeout = int(os.environ.get("DMAD_BENCH_PROBE_TIMEOUT", "300"))
    backoffs = [30, 90, 180]
    env = dict(os.environ)
    env["_DMAD_BENCH_CHILD"] = "1"

    def probe() -> bool:
        """Fail fast when the tunnel is wedged in hang-mode (backend init
        blocks forever): a cheap jax.devices() child with a short timeout,
        so a dead tunnel costs ~probe_timeout per attempt instead of the
        full bench watchdog (which must stay long enough for the ~5 min
        cold certify compile)."""
        try:
            return subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout, capture_output=True,
            ).returncode == 0
        except subprocess.TimeoutExpired:
            return False

    rc = -1
    for i in range(attempts):
        if i:
            delay = backoffs[min(i - 1, len(backoffs) - 1)]
            print(f"bench: attempt {i} failed rc={rc}; retrying in {delay}s "
                  f"(fresh axon client)", file=sys.stderr, flush=True)
            time.sleep(delay)
        if not probe():
            print(f"bench: attempt {i + 1} pre-probe found no live backend "
                  f"within {probe_timeout}s; skipping", file=sys.stderr, flush=True)
            rc = 125
            continue
        try:
            rc = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__)],
                env=env, timeout=watchdog,
            ).returncode
        except subprocess.TimeoutExpired:
            print(f"bench: attempt {i + 1} exceeded watchdog ({watchdog}s)",
                  file=sys.stderr, flush=True)
            rc = 124
        if rc == 0:
            return 0
    print(json.dumps({
        "metric": "certified_utts_per_hr_N100k",
        "value": None,
        "unit": "utt/hr",
        "vs_baseline": None,
        "error": f"all {attempts} attempts failed, last rc={rc} "
                 "(125 = tunnel pre-probe timeout / wedged backend; "
                 "see stderr for tracebacks)",
        "last_green": {"value": 10.40, "round": 2,
                       "note": "most recent driver-recorded measurement"},
    }), flush=True)
    return 1


if __name__ == "__main__":
    import os
    import sys

    if os.environ.get("_DMAD_BENCH_CHILD"):
        main()
    else:
        sys.exit(_supervise())
