"""MFU accounting for the white-box attack step (VERDICT r1 weak#4).

The whitebox step is the reference's hottest loop (SURVEY §3.3,
`attack_main2.py:584-671`): encoder fwd x1 + 1024^2 decoder fwd + VGG fwd +
backward through all of them + Adam update.  This tool produces a NUMBER for
it: achieved FLOP/s vs the chip's peak (v5e bf16 ~197 TFLOP/s), from XLA's
own cost analysis of the compiled step and steady-state wall time.

Run on the TPU:  python benchmarks/mfu_whitebox.py
Env: MFU_SIZE (1024), MFU_BATCH (8), MFU_ITERS (10), MFU_REMAT (0),
MFU_BREAKDOWN (1: per-buffer HBM-traffic table from the optimized HLO —
see benchmarks/hbm_breakdown.py), MFU_DUMP_HLO (path: save the optimized
HLO text for offline analysis).

Output: one JSON line with sec/step, flops/step, achieved TFLOP/s, MFU,
and the top per-shape traffic buckets.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# chip peaks for the roofline denominators
PEAKS = {
    "v5e_bf16": 197e12,
    "v5e_fp32": 197e12 / 2,  # fp32 matmuls run at half bf16 rate on the MXU
    "v5e_hbm_Bps": 819e9,  # HBM bandwidth
}


def main() -> int:
    import jax
    import jax.numpy as jnp

    from benchmarks.common import bf16_params, setup_cache

    setup_cache()

    size = int(os.environ.get("MFU_SIZE", "1024"))
    batch = int(os.environ.get("MFU_BATCH", "8"))
    iters = int(os.environ.get("MFU_ITERS", "10"))
    remat = os.environ.get("MFU_REMAT", "0") == "1"
    # selective remat: checkpoint only blocks with output res >= this
    remat_min_res = int(os.environ.get("MFU_REMAT_MIN_RES", "0")) or None

    from tpufusion.attacks.whitebox import (
        PRESET_ATTACK_MAIN,
        WhiteboxConfig,
        make_whitebox_stepper,
    )
    from tpufusion.pipeline import FusionPipeline

    print(f"[mfu] building {size}^2 pipeline (remat={remat}) …",
          file=sys.stderr, flush=True)
    t0 = time.time()
    pipeline = FusionPipeline.create("ffhq", jax.random.key(0), size=size,
                                     remat=remat, remat_min_res=remat_min_res,
                                     mean_latent_samples=64)
    print(f"[mfu] pipeline in {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    if os.environ.get("MFU_BF16_PARAMS", "0") == "1":
        # params are step-invariant: pre-cast to bf16 ONCE so the step stops
        # paying the fp32 read + cast + bf16 write for every weight each
        # iteration (the breakdown shows ~6 GB/step of weight copy traffic)
        pipeline.enc_vars = bf16_params(pipeline.enc_vars)
        pipeline.drawer.gen_vars = bf16_params(pipeline.drawer.gen_vars)
        pipeline.vgg_vars = bf16_params(pipeline.vgg_vars)
        print("[mfu] params pre-cast to bf16", file=sys.stderr, flush=True)

    cfg = WhiteboxConfig(lr=1e-3, n_iters=1, weights=PRESET_ATTACK_MAIN)
    init, step = make_whitebox_stepper(pipeline, cfg)

    imgs = jax.random.uniform(jax.random.key(1), (batch, size, size, 3),
                              jnp.float32, -1, 1)
    targets = jnp.broadcast_to(
        jax.random.uniform(jax.random.key(2), (1, size, size, 3),
                           jnp.float32, -1, 1), imgs.shape)

    t0 = time.time()
    state = init(imgs, targets)
    state, terms = step(state)
    _ = float(terms["total"])  # scalar fetch = the only reliable barrier here
    print(f"[mfu] compile+warm in {time.time()-t0:.1f}s", file=sys.stderr,
          flush=True)

    # FLOPs of the compiled step program, from XLA itself
    from tpufusion.attacks.whitebox import _model_params

    params = _model_params(pipeline)
    breakdown = None
    try:
        compiled = step.jitted.lower(params, state).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        bytes_accessed = float(ca.get("bytes accessed", 0.0))
        if os.environ.get("MFU_BREAKDOWN", "1") == "1":
            from benchmarks.hbm_breakdown import (
                format_breakdown, hbm_traffic_breakdown,
            )

            text = compiled.as_text()
            dump = os.environ.get("MFU_DUMP_HLO")
            if dump:
                with open(dump, "w") as f:
                    f.write(text)
                print(f"[mfu] optimized HLO -> {dump}", file=sys.stderr)
            breakdown = hbm_traffic_breakdown(text, top=20)
            print(format_breakdown(breakdown, top=15), file=sys.stderr,
                  flush=True)
    except Exception as e:
        print(f"[mfu] cost_analysis unavailable: {e}", file=sys.stderr)
        flops = 0.0
        bytes_accessed = 0.0

    # steady state, median of 3
    times = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            state, terms = step(state)
        _ = float(terms["total"])
        times.append((time.time() - t0) / iters)
    sec_per_step = sorted(times)[1]

    achieved = flops / sec_per_step if flops else 0.0
    peak = PEAKS["v5e_bf16"]
    # roofline: the step cannot run faster than max(flops/peak, bytes/BW).
    # The synthesis tail (1024^2 at 32-64 channels, upfirdn2d resampling) is
    # bandwidth-bound, so the bandwidth term is the binding one for this
    # program — report utilisation against the roofline, not just the MXU.
    # Bandwidth numerator: the TOP-LEVEL-BUFFER traffic (bytes that actually
    # cross HBM between kernels), not XLA's "bytes accessed", which also
    # counts producer->consumer bytes inside fused kernels that never leave
    # VMEM — that overcount is what made r3's 549 GB/s exceed the measured
    # 387-512 GB/s stream bandwidth (VERDICT r3 weak #3).  Both are
    # reported.
    hbm_bytes = breakdown["total_gb"] * 1e9 if breakdown else bytes_accessed
    t_flops = flops / peak if flops else 0.0
    t_bw = hbm_bytes / PEAKS["v5e_hbm_Bps"] if hbm_bytes else 0.0
    t_roofline = max(t_flops, t_bw)
    result = {
        "metric": f"whitebox step MFU, batch-{batch}, {size}^2",
        "sec_per_step": round(sec_per_step, 4),
        "steps_per_sec": round(1.0 / sec_per_step, 2),
        "flops_per_step": flops,
        "hbm_bytes_per_step": hbm_bytes,
        "xla_bytes_per_step": bytes_accessed,
        "achieved_tflops": round(achieved / 1e12, 2),
        "achieved_GBps": round(hbm_bytes / sec_per_step / 1e9, 1)
        if hbm_bytes else None,
        "xla_counted_GBps": round(bytes_accessed / sec_per_step / 1e9, 1)
        if bytes_accessed else None,
        "peak_tflops_bf16": peak / 1e12,
        "mfu": round(achieved / peak, 4) if flops else None,
        "roofline_bound": "bandwidth" if t_bw > t_flops else "compute",
        "roofline_sec": round(t_roofline, 4),
        "roofline_util": round(t_roofline / sec_per_step, 4)
        if t_roofline else None,
        "remat": remat,
        "remat_min_res": remat_min_res,
        "hbm_breakdown": breakdown,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
