"""Pallas fused styled-conv vs XLA composite — the north-star measurement
(BASELINE.json: "fused Pallas modconv+bias+act kernels"; VERDICT r1 weak#6).

Per synthesis resolution of the 1024^2 config-f generator, times the
non-upsampling StyledConv (modulate + 3x3 conv + demod + noise + bias +
leaky-ReLU) three ways is not needed — two ways:
  - XLA composite  (ops/modconv.py path, current default)
  - Pallas kernel  (ops/styled_conv.py)
and then the FULL 1024^2 synthesis forward with the kernel off/on.

Run on the TPU:  python benchmarks/modconv_bench.py
Results land in docs/DESIGN.md §3; the faster path stays the default.

Env: MB_BATCH (8), MB_ITERS (20), MB_SIZE (1024 end-to-end size), MB_E2E=0
to skip the end-to-end part.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, args, iters: int) -> float:
    """Median-of-3 steady-state seconds per call (shared timer)."""
    from benchmarks.common import timed_median

    return timed_median(fn, *args, calls=iters)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from benchmarks.common import setup_cache

    setup_cache()

    from tpufusion.models.stylegan2 import channel_map
    from tpufusion.ops.styled_conv import fused_styled_conv, styled_conv_reference

    batch = int(os.environ.get("MB_BATCH", "8"))
    iters = int(os.environ.get("MB_ITERS", "20"))
    size = int(os.environ.get("MB_SIZE", "1024"))
    dt = jnp.bfloat16 if jax.default_backend() in ("tpu", "axon") else jnp.float32

    ch = channel_map(size)
    print(f"backend={jax.default_backend()} batch={batch} dtype={dt.__name__}",
          flush=True)
    print(f"{'res':>5} {'cin':>5} {'cout':>5} {'xla_ms':>9} {'pallas_ms':>10} "
          f"{'pallas/xla':>10}", flush=True)

    xla_j = jax.jit(styled_conv_reference)
    pl_j = jax.jit(fused_styled_conv)

    rows = []
    res = 16
    while res <= size:
        cin = cout = ch.get(res, ch[min(ch)])
        x = jax.random.normal(jax.random.key(1), (batch, res, res, cin), dt)
        w = jax.random.normal(jax.random.key(2), (3, 3, cin, cout), jnp.float32)
        s = jax.random.normal(jax.random.key(3), (batch, cin), jnp.float32) * 0.3 + 1.0
        nz = jax.random.normal(jax.random.key(4), (1, res, res, 1), jnp.float32)
        ns = jnp.asarray(0.2, jnp.float32)
        b = jax.random.normal(jax.random.key(5), (cout,), jnp.float32) * 0.1
        args = (x, w, s, nz, ns, b)

        t_xla = bench(xla_j, args, iters)
        try:
            t_pl = bench(pl_j, args, iters)
        except Exception as e:  # compile failure is a result too
            print(f"{res:>5} {cin:>5} {cout:>5} {t_xla * 1e3:>9.3f} "
                  f"{'FAIL':>10} ({type(e).__name__})", flush=True)
            res *= 2
            continue
        rows.append((res, t_xla, t_pl))
        print(f"{res:>5} {cin:>5} {cout:>5} {t_xla * 1e3:>9.3f} "
              f"{t_pl * 1e3:>10.3f} {t_pl / t_xla:>10.2f}", flush=True)
        res *= 2

    if rows:
        tot_x = sum(r[1] for r in rows)
        tot_p = sum(r[2] for r in rows)
        print(f"sum over resolutions: xla {tot_x*1e3:.2f} ms, pallas "
              f"{tot_p*1e3:.2f} ms, ratio {tot_p/tot_x:.2f}", flush=True)

    if os.environ.get("MB_E2E", "1") == "1":
        # full synthesis forward, kernel off vs on
        from tpufusion.models.stylegan2 import create_generator

        gen, variables = create_generator(size, jax.random.key(0))
        w_plus = jax.random.normal(jax.random.key(7),
                                   (batch, gen.n_latent, 512), jnp.float32) * 0.3

        def _forced(mode):
            def fwd(v, wp):
                prev = os.environ.get("TPUFUSION_PALLAS_MODCONV")
                os.environ["TPUFUSION_PALLAS_MODCONV"] = mode
                try:
                    return gen.apply(v, [wp], input_is_latent=True).image
                finally:
                    if prev is None:
                        os.environ.pop("TPUFUSION_PALLAS_MODCONV", None)
                    else:
                        os.environ["TPUFUSION_PALLAS_MODCONV"] = prev
            return fwd

        e2e_iters = max(iters // 4, 3)
        t_off = bench(jax.jit(_forced("off")), (variables, w_plus), e2e_iters)
        t_auto = bench(jax.jit(_forced("auto")), (variables, w_plus), e2e_iters)
        t_all = bench(jax.jit(_forced("all")), (variables, w_plus), e2e_iters)
        print(f"e2e {size}^2 synthesis fwd batch-{batch}: xla {t_off*1e3:.1f} ms, "
              f"pallas-window(auto) {t_auto*1e3:.1f} ms "
              f"(ratio {t_auto/t_off:.2f}), pallas-all {t_all*1e3:.1f} ms "
              f"(ratio {t_all/t_off:.2f})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
