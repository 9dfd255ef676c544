"""Headline benchmark: white-box attack steps/sec on 1024^2 fusion.

BASELINE.json north star: >= 100 PGD steps/sec at batch-8 on one v5e chip,
where one step is the reference's ``optimize_vgg`` iteration (SURVEY §3.3):
encoder fwd + decoder fwd + VGG fwd(s) + full backward + Adam update, at
generator resolution 1024^2 with encoder/VGG at 256^2.

Measures the REAL attack program: the batched white-box attack
(``vmap_whitebox``) whose ``n_iters`` loop is one ``lax.scan`` inside one
jit — a single device dispatch per batch, exactly how ``runner.py`` launches
attacks.  steps/sec = n_iters * n_calls / elapsed (after a warmup call).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/sec", "vs_baseline": N}
``vs_baseline`` is value / 100 (the north-star target; the reference
publishes no number of its own — README is a 2-line abstract).

Env knobs: BENCH_SIZE (1024), BENCH_BATCH (8), BENCH_STEPS (scan length, 50),
BENCH_CALLS (repeat calls, 2), BENCH_TINY=1 for a CPU smoke run.
"""

from __future__ import annotations

import json
import os
import sys
import time


def log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def main() -> int:
    tiny = os.environ.get("BENCH_TINY", "0") == "1"
    size = int(os.environ.get("BENCH_SIZE", "32" if tiny else "1024"))
    batch = int(os.environ.get("BENCH_BATCH", "2" if tiny else "8"))
    steps = int(os.environ.get("BENCH_STEPS", "5" if tiny else "50"))
    calls = int(os.environ.get("BENCH_CALLS", "1" if tiny else "2"))

    import jax

    # persistent compile cache: the remote TPU compiler is slow; second runs
    # of the same bench config skip compilation entirely
    cache_dir = os.environ.get(
        "JAX_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache_tpu"),
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import jax.numpy as jnp

    from tpufusion.attacks.whitebox import (
        PRESET_ATTACK_MAIN,
        WhiteboxConfig,
        vmap_whitebox,
    )
    from tpufusion.pipeline import FusionPipeline, create_test_pipeline

    log(f"backend={jax.default_backend()} size={size} batch={batch} "
        f"steps={steps} calls={calls}")
    t0 = time.time()
    if tiny:
        pipeline = create_test_pipeline("ffhq", jax.random.key(0), size=size)
    else:
        pipeline = FusionPipeline.create(
            "ffhq", jax.random.key(0), size=size, remat=True,
            mean_latent_samples=256,
        )
    log(f"pipeline built in {time.time() - t0:.1f}s")

    cfg = WhiteboxConfig(lr=1e-3, n_iters=steps, weights=PRESET_ATTACK_MAIN)
    attack = vmap_whitebox(pipeline, cfg)

    imgs = jax.random.uniform(
        jax.random.key(1), (batch, size, size, 3), jnp.float32, -1, 1
    )
    targets = jax.random.uniform(
        jax.random.key(2), (1, size, size, 3), jnp.float32, -1, 1
    )

    t0 = time.time()
    adv, trace = attack(imgs, targets)  # compile + warmup
    jax.block_until_ready(adv)
    log(f"compile+warmup call ({steps} steps) in {time.time() - t0:.1f}s")

    t0 = time.time()
    for _ in range(calls):
        adv, trace = attack(imgs, targets)
    jax.block_until_ready(adv)
    dt = time.time() - t0

    steps_per_sec = steps * calls / dt
    log(f"{calls} calls x {steps} scanned steps in {dt:.2f}s "
        f"(final loss {float(trace['total'][0, -1]):.4f})")
    print(json.dumps({
        "metric": f"whitebox attack steps/sec, batch-{batch}, {size}^2 fusion",
        "value": round(steps_per_sec, 3),
        "unit": "steps/sec",
        "vs_baseline": round(steps_per_sec / 100.0, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
