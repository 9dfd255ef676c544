"""Headline benchmark: white-box/PGD attack steps/sec on 1024^2 fusion.

BASELINE.json north star: >= 100 PGD steps/sec at batch-8 on one v5e chip,
where one step is the reference's ``optimize_vgg`` iteration (SURVEY §3.3):
encoder fwd + decoder fwd + VGG fwd(s) + full backward + Adam update, at
generator resolution 1024^2 with encoder/VGG at 256^2.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/sec", "vs_baseline": N}
``vs_baseline`` is value / 100 (the north-star target; the reference
publishes no number of its own — README is a 2-line abstract).

Env knobs: BENCH_SIZE (default 1024), BENCH_BATCH (8), BENCH_STEPS (30),
BENCH_TINY=1 for a smoke run on CPU.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    tiny = os.environ.get("BENCH_TINY", "0") == "1"
    size = int(os.environ.get("BENCH_SIZE", "32" if tiny else "1024"))
    batch = int(os.environ.get("BENCH_BATCH", "2" if tiny else "8"))
    steps = int(os.environ.get("BENCH_STEPS", "5" if tiny else "30"))

    import jax
    import jax.numpy as jnp

    from tpufusion.attacks.whitebox import PRESET_ATTACK_MAIN, WhiteboxConfig
    from tpufusion.parallel import create_mesh, make_sharded_whitebox_step
    from tpufusion.pipeline import FusionPipeline, create_test_pipeline

    t0 = time.time()
    if tiny:
        pipeline = create_test_pipeline("ffhq", jax.random.key(0), size=size)
    else:
        pipeline = FusionPipeline.create(
            "ffhq", jax.random.key(0), size=size, remat=True,
            mean_latent_samples=256,
        )
    print(f"[bench] pipeline built in {time.time() - t0:.1f}s "
          f"(size={size}, batch={batch}, backend={jax.default_backend()})",
          file=sys.stderr)

    mesh = create_mesh(jax.devices()[:1])
    cfg = WhiteboxConfig(lr=1e-3, n_iters=1, weights=PRESET_ATTACK_MAIN)
    step, init, place_batch = make_sharded_whitebox_step(pipeline, cfg, mesh)

    key = jax.random.key(1)
    imgs = jax.random.uniform(key, (batch, size, size, 3), jnp.float32, -1, 1)
    targets = jax.random.uniform(jax.random.key(2), (1, size, size, 3), jnp.float32, -1, 1)
    targets = jnp.broadcast_to(targets, imgs.shape)
    imgs, targets = place_batch(imgs, targets)

    with mesh:
        t0 = time.time()
        state = init(imgs, targets)
        jax.block_until_ready(state["latent_org"])
        print(f"[bench] init in {time.time() - t0:.1f}s", file=sys.stderr)

        t0 = time.time()
        state, loss = step(state)  # compile
        jax.block_until_ready(loss)
        print(f"[bench] first step (compile) {time.time() - t0:.1f}s", file=sys.stderr)

        t0 = time.time()
        for _ in range(steps):
            state, loss = step(state)
        jax.block_until_ready(loss)
        dt = time.time() - t0

    steps_per_sec = steps / dt
    print(f"[bench] {steps} steps in {dt:.2f}s", file=sys.stderr)
    print(json.dumps({
        "metric": f"whitebox attack steps/sec, batch-{batch}, {size}^2 fusion",
        "value": round(steps_per_sec, 3),
        "unit": "steps/sec",
        "vs_baseline": round(steps_per_sec / 100.0, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
