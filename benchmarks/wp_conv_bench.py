"""Isolated benchmark: width-packed Pallas tail conv vs XLA direct conv.

Measures the two hot synthesis-tail shapes (docs/DESIGN.md §9: 3x3 @1024^2
C=32 ran at 9.7 TF/s under XLA, @512^2 C=64 at 28 TF/s) for forward and
forward+backward, in bf16 (the production dtype of the synthesis path).

Run on the TPU:  python benchmarks/wp_conv_bench.py
Env: WPB_CASES ("1024x32,512x64"), WPB_CALLS (10), WPB_DTYPE (bf16|f32).
Prints one JSON line per case.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from benchmarks.common import setup_cache, timed_median

    setup_cache()

    from tpufusion.ops.pallas_conv import conv3x3_wp

    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[
        os.environ.get("WPB_DTYPE", "bf16")]
    calls = int(os.environ.get("WPB_CALLS", "10"))
    cases = []
    for tok in os.environ.get("WPB_CASES", "1024x32,512x64").split(","):
        h, c = tok.strip().split("x")
        cases.append((int(h), int(c)))

    def direct(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def timed(fn, *args):
        return timed_median(fn, *args, calls=calls)

    if jnp.dtype(dtype).itemsize > 2:
        print(json.dumps({"skipped": "conv3x3_wp kernels are VMEM-sized "
                          "for <=2-byte dtypes; WPB_DTYPE=f32 unsupported"}))
        return 0

    for h, c in cases:
        n = 8
        x = jax.random.normal(jax.random.key(0), (n, h, h, c), dtype)
        w = (jax.random.normal(jax.random.key(1), (3, 3, c, c),
                               jnp.float32) * 0.05).astype(dtype)
        g = jax.random.normal(jax.random.key(2), (n, h, h, c), dtype)

        fwd_x = jax.jit(direct)
        fwd_p = jax.jit(conv3x3_wp)
        t_xla_f = timed(fwd_x, x, w)
        t_wp_f = timed(fwd_p, x, w)

        # g rides as an ARGUMENT: a closed-over jax.Array embeds as an HLO
        # constant (512 MB here) and overflows the remote compile helper's
        # request limit (HTTP 413, measured r5).
        def loss_x(a, b, gg):
            return jnp.sum((direct(a, b) * gg).astype(jnp.float32))

        def loss_p(a, b, gg):
            return jnp.sum((conv3x3_wp(a, b) * gg).astype(jnp.float32))

        bwd_x = jax.jit(jax.grad(loss_x, (0, 1)))
        bwd_p = jax.jit(jax.grad(loss_p, (0, 1)))
        t_xla_b = timed(bwd_x, x, w, g)
        t_wp_b = timed(bwd_p, x, w, g)

        nominal = 2 * n * h * h * 9 * c * c
        result = {
            "metric": f"3x3 SAME conv {h}^2 C={c} batch-{n} {dtype.__name__}",
            "fwd_ms_xla": round(t_xla_f * 1e3, 2),
            "fwd_ms_wp": round(t_wp_f * 1e3, 2),
            "fwd_speedup": round(t_xla_f / t_wp_f, 2),
            "fwd_tflops_xla": round(nominal / t_xla_f / 1e12, 1),
            "fwd_tflops_wp": round(nominal / t_wp_f / 1e12, 1),
            "grad_ms_xla": round(t_xla_b * 1e3, 2),
            "grad_ms_wp": round(t_wp_b * 1e3, 2),
            "grad_speedup": round(t_xla_b / t_wp_b, 2),
        }
        print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
