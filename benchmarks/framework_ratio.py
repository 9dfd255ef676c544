"""Same-device framework ratio: reference-style torch EAGER white-box step
vs tpufusion's jitted step (VERDICT r3 ask #1's speedup methodology).

The reference's GPU is not available here (and it publishes no numbers), so
the only fair, measurable comparison is SAME hardware + SAME math: this tool
runs ONE white-box optimisation step — e4e forward, StyleGAN2 synthesis
forward, 2 VGG16 forwards, the 5-term `attack_main2.py:649` loss, full
backward to the pixels, Adam update — twice on this host's CPU:

  1. torch eager, composed exactly like the reference composes it
     (per-op kernel launches, autograd tape; `attack_main2.py:584-671`),
     using the numerics-validated torch oracles from ``tests/torch_ref.py``;
  2. tpufusion's ``make_whitebox_stepper`` (one fused XLA program).

The printed ratio isolates the FRAMEWORK/COMPILER factor of the speedup
story; the hardware factor (v5e vs the reference's GPU) is reported
separately by ``bench.py``'s absolute numbers.  BASELINE.md combines both.

Weights are random (identical architectures, not identical values): timing
is shape-dependent, not value-dependent.

Env knobs: FR_SIZE (128), FR_STEPS (3).
Prints one JSON line: {torch_ms_per_step, jax_ms_per_step, ratio, ...}.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def log(msg: str) -> None:
    print(f"[framework_ratio] {msg}", file=sys.stderr, flush=True)


def torch_step_ms(size: int, steps: int) -> float:
    """Reference-style eager whitebox step (attack_main2.py:597-666
    composition) on CPU; returns ms/step (steady state, after 1 warmup)."""
    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", "tests"))
    from torch_ref import Encoder4EditingT, GeneratorT, VGGBaseT

    torch.manual_seed(0)
    n_latent = int(math.log2(size)) * 2 - 2
    gen = GeneratorT(size, channel_multiplier=2).eval()
    enc = Encoder4EditingT(n_styles=n_latent).build_heads(size).eval()
    vgg = VGGBaseT().eval()
    for m in (gen, enc, vgg):
        for p in m.parameters():
            p.requires_grad_(False)

    def mse(a, b):
        return torch.mean((a - b) ** 2)

    def vgg_dist(feats_a, feats_b):
        return sum(mse(a, b) for a, b in zip(feats_a, feats_b))

    img = torch.rand(1, 3, size, size) * 2 - 1
    target = torch.rand(1, 3, size, size) * 2 - 1
    with torch.no_grad():
        latent_org = enc(img)
        latent_target = enc(target)
        feats_org = vgg(img)

    x = img.clone().requires_grad_(True)
    opt = torch.optim.Adam([x], lr=1e-4)

    def one_step():
        opt.zero_grad()
        latent_pred = enc(x)
        img_rec = gen([latent_pred], input_is_latent=True)
        feats_x = vgg(x)
        # `attack_main2.py:649`: 10*l_latent_target + l_img_rec_target
        #   - l_latent_org + 20*l_img_org + l_lpips_img
        loss = (10.0 * mse(latent_target, latent_pred)
                + mse(target, img_rec)
                - mse(latent_org, latent_pred)
                + 20.0 * mse(img, x)
                + vgg_dist(feats_x, feats_org))
        loss.backward()
        opt.step()
        return float(loss)

    one_step()  # warmup (allocator, thread pools)
    t0 = time.time()
    for _ in range(steps):
        one_step()
    return (time.time() - t0) / steps * 1000.0


def jax_step_ms(size: int, steps: int) -> float:
    """tpufusion stepwise whitebox step on the same CPU; ms/step."""
    import jax

    from benchmarks.common import setup_cache

    setup_cache(tiny=True, min_compile_secs=0.3)

    import jax.numpy as jnp

    from tpufusion.attacks.whitebox import (
        PRESET_ATTACK_MAIN, WhiteboxConfig, make_whitebox_stepper,
    )
    from tpufusion.pipeline import FusionPipeline

    pipeline = FusionPipeline.create("ffhq", jax.random.key(0), size=size,
                                     mean_latent_samples=8)
    cfg = WhiteboxConfig(lr=1e-4, n_iters=1, weights=PRESET_ATTACK_MAIN)
    init, step = make_whitebox_stepper(pipeline, cfg)
    img = jax.random.uniform(jax.random.key(1), (1, size, size, 3),
                             jnp.float32, -1, 1)
    target = jax.random.uniform(jax.random.key(2), (1, size, size, 3),
                                jnp.float32, -1, 1)
    t0 = time.time()
    state = init(img, target)
    state, terms = step(state)
    _ = float(terms["total"])  # compile + warmup
    log(f"jax compile+warmup {time.time() - t0:.1f}s")
    t0 = time.time()
    for _ in range(steps):
        state, terms = step(state)
    _ = float(terms["total"])
    return (time.time() - t0) / steps * 1000.0


def main() -> int:
    size = int(os.environ.get("FR_SIZE", "128"))
    steps = int(os.environ.get("FR_STEPS", "3"))
    skip_jax = os.environ.get("FR_SKIP_JAX", "0") == "1"
    log(f"size={size} steps={steps} (both on this host's CPU)")
    t0 = time.time()
    t_ms = torch_step_ms(size, steps)
    log(f"torch eager: {t_ms:.0f} ms/step ({time.time() - t0:.1f}s total)")
    out = {
        "metric": f"whitebox step ms, {size}^2, batch-1, host CPU",
        "torch_ms_per_step": round(t_ms, 1),
    }
    if not skip_jax:  # FR_SKIP_JAX=1: torch-only (a 1024^2 XLA:CPU compile
        # takes tens of minutes on this 1-core host; the 1024^2 torch point
        # feeds BASELINE.md's reference-wall estimate on its own)
        j_ms = jax_step_ms(size, steps)
        log(f"tpufusion jitted: {j_ms:.0f} ms/step")
        out["jax_ms_per_step"] = round(j_ms, 1)
        out["ratio"] = round(t_ms / j_ms, 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
