"""Headline benchmark: PGD attack steps/sec, batch-8, 1024^2 fusion inputs.

BASELINE.json north star: ">= 100 PGD steps/sec on batch-8 1024^2 fusion on
one v5e chip".  One PGD step (reference semantics, `interpolation.py:74-94`
inline copy + torchattacks recipe `:1331-1365`): forward the attacked model
on the 1024^2 adversarial batch, backward to the pixels, fused
grad-sign + eps-projection + clamp update.  The attacked model here is the
fusion pipeline's encoder (the e4e latent-drift objective the framework's
``pgd`` attack uses — `tpufusion/runner.py`), with the reference's
avg-pool-to-256 preprocessing inside the differentiated graph.

The whole ``steps`` loop is ONE ``lax.scan`` in ONE jit — a single device
dispatch — so the number is pure device throughput.

Also logs (stderr) the heavier white-box step throughput (encoder + 1024^2
decoder + VGG backward per step, SURVEY §3.3) when BENCH_WHITEBOX=1.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/sec", "vs_baseline": N}
``vs_baseline`` = value / 100 (north-star target; the reference publishes no
numbers — its README is a 2-line abstract).

Env knobs: BENCH_SIZE (1024), BENCH_BATCH (8), BENCH_STEPS (100),
BENCH_CALLS (3), BENCH_TINY=1 (CPU smoke), BENCH_WHITEBOX=1 (extra metric).
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
    steps = int(os.environ.get("BENCH_STEPS", "5" if tiny else "100"))
    calls = int(os.environ.get("BENCH_CALLS", "1" if tiny else "3"))

    import jax

    cache_dir = os.environ.get(
        "JAX_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache_tpu"),
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import jax.numpy as jnp

    from tpufusion.attacks.pgd import PGDConfig, make_pgd
    from tpufusion.core.imaging import avg_pool
    from tpufusion.pipeline import FusionPipeline, create_test_pipeline

    log(f"backend={jax.default_backend()} size={size} batch={batch} "
        f"steps={steps} calls={calls}")
    t0 = time.time()
    if tiny:
        pipeline = create_test_pipeline("ffhq", jax.random.key(0), size=size)
    else:
        remat = os.environ.get("BENCH_REMAT", "0") == "1"
        pipeline = FusionPipeline.create(
            "ffhq", jax.random.key(0), size=size, remat=remat,
            mean_latent_samples=256,
        )
    log(f"pipeline built in {time.time() - t0:.1f}s")

    enc = pipeline.encode_fn()
    factor = pipeline.pool_factor

    imgs = jax.random.uniform(
        jax.random.key(1), (batch, size, size, 3), jnp.float32, -1, 1
    )

    # ---- primary: the reference's PGD recipe (`interpolation.py:1343`) —
    # classifier-gradient PGD against the resnet18 gender model, on full
    # 1024^2 fusion inputs (resized to the classifier's 256^2 inside the
    # differentiated graph, as the reference's transforms do).
    from tpufusion.models.resnet import create_resnet18

    clf_size = min(size, 256)
    clf_factor = max(size // clf_size, 1)
    clf, clf_vars = create_resnet18(
        jax.random.key(5), num_classes=2,
        image_size=clf_size, policy=pipeline.policy,
    )
    labels = jax.jit(
        lambda v, x: jnp.argmax(clf.apply(v, avg_pool(x, clf_factor)), -1)
    )(clf_vars, imgs)

    # params + labels as loss args (closure-captured params would embed
    # the model as constants into the compile request)
    def ce_loss(adv, clf_params, labels_):
        logits = clf.apply(clf_params, avg_pool(adv, clf_factor))
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        return -jnp.mean(jnp.take_along_axis(logp, labels_[:, None], axis=-1))

    attack = make_pgd(
        ce_loss,
        PGDConfig(eps=16 / 255, alpha=0.01, steps=steps, random_start=True),
    )

    # NB: on the tunnel backend block_until_ready does not synchronize —
    # a scalar value fetch is the only reliable barrier.
    t0 = time.time()
    adv, trace = attack(imgs, jax.random.key(2), clf_vars, labels)
    _ = float(trace[-1])
    log(f"pgd compile+warmup ({steps} steps) in {time.time() - t0:.1f}s")

    t0 = time.time()
    for c in range(calls):
        adv, trace = attack(
            imgs, jax.random.fold_in(jax.random.key(3), c), clf_vars, labels,
        )
    ce = float(trace[-1])  # hard device fetch: forces all queued calls
    dt = time.time() - t0
    steps_per_sec = steps * calls / dt
    flipped = int(jnp.sum(
        jnp.argmax(clf.apply(clf_vars, avg_pool(adv, clf_factor)), -1) != labels
    ))
    log(f"pgd: {calls}x{steps} steps in {dt:.2f}s "
        f"(final CE {ce:.4f}, {flipped}/{batch} flipped)")

    # ---- secondary: encoder-latent-drift PGD (the framework's own 'pgd'
    # attack objective) — the full e4e-50 backward per step.
    latent_org = jax.jit(lambda p, x: enc(p, avg_pool(x, factor)))(
        pipeline.enc_vars, imgs
    )

    def drift_loss(adv, enc_params, ref_codes):
        codes = enc(enc_params, avg_pool(adv, factor))
        return jnp.mean((codes - ref_codes) ** 2)

    drift_steps = max(steps // 4, 1)
    dattack = make_pgd(
        drift_loss,
        PGDConfig(eps=16 / 255, alpha=0.01, steps=drift_steps, random_start=True),
    )
    adv2, dtrace = dattack(imgs, jax.random.key(6), pipeline.enc_vars, latent_org)
    _ = float(dtrace[-1])  # warm/compile
    t0 = time.time()
    adv2, dtrace = dattack(imgs, jax.random.key(7), pipeline.enc_vars, latent_org)
    _ = float(dtrace[-1])
    ddt = time.time() - t0
    log(f"encoder-drift pgd: {drift_steps} steps in {ddt:.2f}s -> "
        f"{drift_steps / ddt:.2f} steps/sec (full e4e-50 backward)")

    if os.environ.get("BENCH_WHITEBOX", "0") == "1":
        # stepwise executor: the scanned whole-loop program trips this
        # deployment's AOT compile helper; one-step programs compile in ~25 s
        from tpufusion.attacks.whitebox import (
            PRESET_ATTACK_MAIN, WhiteboxConfig, make_whitebox_stepper,
        )

        wcfg = WhiteboxConfig(lr=1e-3, n_iters=1, weights=PRESET_ATTACK_MAIN)
        winit, wstep = make_whitebox_stepper(pipeline, wcfg)
        targets = jnp.broadcast_to(
            jax.random.uniform(jax.random.key(4), (1, size, size, 3),
                               jnp.float32, -1, 1),
            imgs.shape,
        )
        t0 = time.time()
        state = winit(imgs, targets)
        state, terms = wstep(state)
        _ = float(terms["total"])
        log(f"whitebox compile+warmup in {time.time() - t0:.1f}s")
        n_wsteps = max(steps // 4, 1)
        t0 = time.time()
        for _ in range(n_wsteps):
            state, terms = wstep(state)
        _ = float(terms["total"])
        wdt = time.time() - t0
        log(f"whitebox: {n_wsteps} steps in {wdt:.2f}s -> "
            f"{n_wsteps / wdt:.2f} steps/sec (enc+dec+vgg backward)")

    print(json.dumps({
        "metric": f"PGD attack steps/sec, batch-{batch}, {size}^2 fusion inputs",
        "value": round(steps_per_sec, 3),
        "unit": "steps/sec",
        "vs_baseline": round(steps_per_sec / 100.0, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
