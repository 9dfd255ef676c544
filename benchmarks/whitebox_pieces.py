"""Decompose the whitebox step into its sub-programs (VERDICT r3 task #1).

The whitebox step = encoder fwd + synthesis fwd + 2x VGG fwd + backward
through all of them + Adam.  ``mfu_whitebox.py`` gives the whole-program
number; this tool measures each piece as its own jitted grad program so the
remaining roofline gap can be attributed: a piece that is COMPUTE-bound
(encoder/VGG 256^2 convs at 512 channels drive the MXU) cannot sustain peak
HBM bandwidth, so the aggregate GB/s of the fused step is mathematically
below peak even at a perfect schedule.

Per piece: wall ms (median of 3 x iters), XLA flops + bytes, per-piece
roofline ms = max(flops/peak, bytes/BW), and the piece's bound resource.
Final line: sum of piece rooflines (serial model) vs the whole-step
measurement — the honest lower bound for THIS algorithm on this chip lies
between max(sum_bytes/BW, sum_flops/peak) (perfect overlap) and the serial
sum.

Run on TPU: python benchmarks/whitebox_pieces.py   (env: WP_SIZE, WP_BATCH,
WP_ITERS)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK = 197e12
BW = 819e9


def measure(name, fn, *args, iters=10):
    from benchmarks.common import timed_median

    sec = timed_median(fn, *args, calls=iters)
    try:
        compiled = fn.lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
    except Exception:
        flops = byts = 0.0
    t_f, t_b = flops / PEAK, byts / BW
    row = dict(piece=name, ms=round(sec * 1e3, 2),
               tflops=round(flops / 1e12, 3), gb=round(byts / 1e9, 2),
               roofline_ms=round(max(t_f, t_b) * 1e3, 2),
               bound="compute" if t_f > t_b else "bandwidth",
               util=round(max(t_f, t_b) / sec, 3) if sec else None)
    print(json.dumps(row), flush=True)
    return row


def main() -> int:
    import jax
    import jax.numpy as jnp

    from benchmarks.common import setup_cache

    setup_cache()

    size = int(os.environ.get("WP_SIZE", "1024"))
    batch = int(os.environ.get("WP_BATCH", "8"))
    iters = int(os.environ.get("WP_ITERS", "10"))

    from tpufusion.pipeline import FusionPipeline

    print(f"[pieces] building {size}^2 pipeline …", file=sys.stderr, flush=True)
    pipeline = FusionPipeline.create("ffhq", jax.random.key(0), size=size,
                                     mean_latent_samples=64)
    from tpufusion.core.imaging import avg_pool

    enc = pipeline.encode_fn()
    dec = pipeline.decode_fn()
    vgg = pipeline.vgg_fn()
    factor = pipeline.pool_factor

    x = jax.random.uniform(jax.random.key(1), (batch, size, size, 3),
                           jnp.float32, -1, 1)
    r_x = jax.jit(lambda v: avg_pool(v, factor))(x)
    latents = jax.jit(enc)(pipeline.enc_vars, r_x)

    rows = []

    # encoder fwd+bwd (through the avg_pool, as the step differentiates it)
    @jax.jit
    def enc_grad(p, x_):
        return jax.grad(
            lambda xx: jnp.sum(enc(p, avg_pool(xx, factor)).astype(jnp.float32) ** 2)
        )(x_)

    rows.append(measure("encoder fwd+bwd @256^2 (thru avg_pool)", enc_grad,
                        pipeline.enc_vars, x, iters=iters))

    # synthesis fwd+bwd wrt its input latents (the path the step uses)
    @jax.jit
    def dec_grad(p, l):
        return jax.grad(
            lambda ll: jnp.sum(dec(p, ll).astype(jnp.float32) ** 2))(l)

    rows.append(measure(f"synthesis fwd+bwd @{size}^2 (wrt latents)", dec_grad,
                        pipeline.drawer.gen_vars, latents, iters=iters))

    # 2x VGG fwd + bwd wrt the 256^2 inputs (both taps the loss uses)
    @jax.jit
    def vgg_grad(p, a, b):
        def f(aa, bb):
            fa = vgg(p, aa)
            fb = vgg(p, bb)
            return (sum(jnp.sum(t.astype(jnp.float32) ** 2) for t in fa)
                    + sum(jnp.sum(t.astype(jnp.float32) ** 2) for t in fb))

        return jax.grad(f, argnums=(0, 1))(a, b)

    rows.append(measure("2x VGG16 fwd+bwd @256^2", vgg_grad, pipeline.vgg_vars,
                        r_x, r_x, iters=iters))

    # Adam-update-only program on the 1024^2 pixel buffer
    import optax

    opt = optax.adam(1e-3)
    opt_state = opt.init(x)

    @jax.jit
    def adam_step(g, x_, s):
        u, s2 = opt.update(g, s)
        return optax.apply_updates(x_, u), s2

    rows.append(measure(f"Adam update @{size}^2 fp32", adam_step, x, x,
                        opt_state, iters=iters))

    serial = sum(r["roofline_ms"] for r in rows)
    tot_f = sum(r["tflops"] for r in rows) * 1e12 / PEAK * 1e3
    tot_b = sum(r["gb"] for r in rows) * 1e9 / BW * 1e3
    print(json.dumps(dict(
        piece="TOTAL (pieces)",
        measured_sum_ms=round(sum(r["ms"] for r in rows), 1),
        serial_roofline_ms=round(serial, 1),
        overlapped_roofline_ms=round(max(tot_f, tot_b), 1),
    )))
    return 0


if __name__ == "__main__":
    sys.exit(main())
