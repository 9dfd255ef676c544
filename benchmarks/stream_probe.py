"""Empirical HBM bandwidth + tail-conv efficiency probe (DESIGN §9 basis).

Measures, with IN-JIT ``fori_loop`` repetition (zero per-dispatch tunnel
overhead):
- the streaming elementwise rate (read+write per pass) on the whitebox
  step's buffer shapes — this is the bandwidth the part actually delivers,
  the honest denominator for the roofline (the 819 GB/s v5e figure is the
  spec sheet; this chip measured 387-512 GB/s);
- the 3x3 NHWC conv at the synthesis-tail shapes, whose low channel counts
  underfill the 128-lane MXU (the motivation for ops/modconv.conv3x3_s2d).

Run on TPU: python benchmarks/stream_probe.py
Prints one JSON line per measurement.
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

    from benchmarks.common import setup_cache

    setup_cache()

    K = int(os.environ.get("PROBE_PASSES", "50"))

    @jax.jit
    def stream(x):
        # K dependent passes over the buffer inside ONE program
        return jax.lax.fori_loop(0, K, lambda i, a: a * 1.000001 + 1e-7, x)

    for shape, dt in [((8, 1024, 1024, 32), jnp.bfloat16),
                      ((8, 1024, 1024, 32), jnp.float32),
                      ((8, 512, 512, 128), jnp.bfloat16),
                      ((64 * 1024 * 1024,), jnp.float32)]:
        x = jnp.zeros(shape, dt)
        y = stream(x); _ = float(y.ravel()[0])  # compile+warm barrier
        t0 = time.time()
        y = stream(x); _ = float(y.ravel()[0])
        per_pass = (time.time() - t0) / K
        nbytes = 2 * x.size * x.dtype.itemsize  # read + write
        print(json.dumps(dict(
            kind="stream", shape=str(shape), dtype=dt.__name__,
            ms_per_pass=round(per_pass * 1e3, 3),
            GBps=round(nbytes / per_pass / 1e9, 1))), flush=True)

    for (h, c) in [(1024, 32), (512, 64), (256, 128)]:
        x = jnp.zeros((8, h, h, c), jnp.bfloat16)
        w = jnp.zeros((3, 3, c, c), jnp.bfloat16)

        @jax.jit
        def convloop(x, w):
            return jax.lax.fori_loop(
                0, 20,
                lambda i, a: jax.lax.conv_general_dilated(
                    a, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC")),
                x)

        y = convloop(x, w); _ = float(y.ravel()[0])
        t0 = time.time()
        y = convloop(x, w); _ = float(y.ravel()[0])
        per = (time.time() - t0) / 20
        flops = 2 * 8 * h * h * c * c * 9
        print(json.dumps(dict(
            kind="conv3x3", res=h, cin=c, ms=round(per * 1e3, 3),
            TFLOPs=round(flops / per / 1e12, 2),
            GBps=round(2 * 2 * 8 * h * h * c / per / 1e9, 1))), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
