"""The five BASELINE.json benchmark configurations, runnable end-to-end.

  1. Single-pair 1-step FGSM on arithmetic fusion (vase-style target input)
  2. PGD-40 subtle-perturbation attack on arithmetic fusion, L-inf eps-ball
  3. Spatial-fusion PGD with the VGG perceptual-loss objective
  4. Localized adversarial-patch attack with masked gradient updates
  5. Batched attack sweep at 1024^2, batch-8, bf16, vmapped PGD

Usage:
  python benchmarks/baseline_configs.py --tiny          # CPU smoke (32^2)
  python benchmarks/baseline_configs.py                 # full scale on TPU
Prints one JSON line per config: {"config": i, "name": ..., "seconds": ...,
"steps_per_sec": ..., "loss_first": ..., "loss_last": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--size", type=int, default=None)
    args = p.parse_args(argv)

    import jax

    from benchmarks.common import setup_cache

    setup_cache(tiny=args.tiny)  # tiny also forces the CPU backend

    import jax.numpy as jnp

    from tpufusion.attacks.fusion_attack import (
        FusionAttackConfig, fgsm_on_fusion, make_fusion_attack,
    )
    from tpufusion.attacks.patch import PatchConfig, init_patch_square, make_patch_attack_step
    from tpufusion.attacks.pgd import PGDConfig, make_pgd
    from tpufusion.attacks.whitebox import PRESET_ATTACK_MAIN, WhiteboxConfig, vmap_whitebox_stepwise
    from tpufusion.core.imaging import avg_pool
    from tpufusion.fusion import n_inputs
    from tpufusion.pipeline import FusionPipeline, create_test_pipeline
    from tpufusion.runner import generate_inputs

    size = args.size or (32 if args.tiny else 1024)
    steps = 5 if args.tiny else 40
    t0 = time.time()
    if args.tiny:
        pipe = create_test_pipeline("ffhq", jax.random.key(0), size=size)
    else:
        pipe = FusionPipeline.create("ffhq", jax.random.key(0), size=size,
                                     mean_latent_samples=256)
    print(f"[configs] pipeline built in {time.time() - t0:.1f}s "
          f"({size}^2, backend={jax.default_backend()})", file=sys.stderr, flush=True)

    n = n_inputs("ffhq")
    inputs = generate_inputs(pipe, n, jax.random.key(1))
    target = jnp.clip(
        pipe.drawer.z_to_image(jax.random.normal(jax.random.key(7777), (1, 512)) * 2.0)[0],
        -1, 1,
    )

    def report(i, name, fn):
        # warm run first: trace+compile must not sit inside the timed
        # region (every other benchmark in the repo warms then times;
        # scalar fetch = the tunnel-reliable completion barrier)
        t0 = time.time()
        _ = float(fn()[-1])
        warm_s = time.time() - t0
        t0 = time.time()
        trace = fn()
        first, last = float(trace[0]), float(trace[-1])
        dt = time.time() - t0
        print(json.dumps({
            "config": i, "name": name, "seconds": round(dt, 2),
            "steps_per_sec": round(len(trace) / dt, 2),
            "warm_seconds": round(warm_s, 2),
            "loss_first": round(first, 5), "loss_last": round(last, 5),
        }), flush=True)

    # 1. single-pair 1-step FGSM on arithmetic fusion
    fgsm = fgsm_on_fusion(pipe, eps=8 / 255 * 2)
    report(1, "fgsm-1 arithmetic fusion",
           lambda: fgsm(inputs, target, jax.random.key(2))[1])

    # 2. PGD-N subtle perturbation on arithmetic fusion (L-inf ball)
    a2 = make_fusion_attack(pipe, FusionAttackConfig(
        mode="arithmetic", objective="pixel", targeted=True,
        pgd=PGDConfig(eps=8 / 255 * 2, alpha=0.01 * 2, steps=steps),
    ))
    report(2, f"pgd-{steps} arithmetic fusion",
           lambda: a2(inputs, target, jax.random.key(3))[1])

    # 3. spatial-fusion PGD with VGG perceptual objective
    a3 = make_fusion_attack(pipe, FusionAttackConfig(
        mode="spatial", objective="vgg", targeted=True,
        pgd=PGDConfig(eps=8 / 255 * 2, alpha=0.01 * 2, steps=steps),
    ))
    report(3, f"pgd-{steps} spatial fusion + vgg objective",
           lambda: a3(inputs, target, jax.random.key(4))[1])

    # 4. localized adversarial patch, masked gradient updates
    pcfg = PatchConfig(patch_frac=0.1, max_count=steps)
    pstep = make_patch_attack_step(pipe, pcfg, target[None] if target.ndim == 3 else target)
    patch0 = init_patch_square(size, 0.1, jax.random.key(5))
    report(4, f"patch attack, {steps} masked grad steps",
           lambda: pstep(inputs[:1], patch0, jax.random.key(6))[1])

    # 5. batched vmapped attack sweep, batch-8, bf16 compute
    sweep_inputs = jnp.concatenate([inputs, inputs[: 8 - n]], axis=0)[:8]
    wcfg = WhiteboxConfig(lr=1e-3, n_iters=max(steps // 8, 1),
                          weights=PRESET_ATTACK_MAIN)
    a5 = vmap_whitebox_stepwise(pipe, wcfg)
    report(5, f"batch-8 vmapped whitebox sweep, {wcfg.n_iters} iters",
           lambda: a5(sweep_inputs, target[None] if target.ndim == 3 else target)[1]["total"][0])
    return 0


if __name__ == "__main__":
    sys.exit(main())
