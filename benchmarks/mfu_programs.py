"""Roofline accounting for the remaining hot programs (VERDICT r3 ask #4):
the fusion-aware PGD step (BASELINE config 2, `attacks/fusion_attack.py`)
and the patch-training inner iteration (`adversarial_patch.py:94-160`;
`attacks/patch.py`), giving them the same HBM/FLOP treatment the whitebox
step got in ``benchmarks/mfu_whitebox.py`` / DESIGN §9.

Both programs scan their optimisation loop INSIDE one jit, so per-step cost
cannot be read off one compile the way the stepwise whitebox could.  This
tool uses a MARGINAL method: run the program at K and 2K steps; the
difference divided by K is the pure per-step cost (prologue — random
start, stop-gradient encodes, patch paste — cancels out).

- WALL time comes from the production LOOPED programs (median of 3
  steady-state rounds at each step count).
- FLOPs/bytes come from fully UNROLLED variants (``unroll=steps``):
  XLA's cost analysis counts a ``while`` body ONCE regardless of trip
  count (verified: K and 2K looped programs report identical totals), so
  only unrolled programs make the K→2K deltas exact.
- HBM traffic is reported twice: ``xla_bytes_per_step`` ("bytes accessed"
  delta — counts every op's operands+outputs, i.e. DOUBLE-counts
  producer→consumer bytes inside fused kernels that never leave VMEM) and
  ``hbm_bytes_per_step`` (top-level-buffer delta via
  ``benchmarks/hbm_breakdown.py`` — bytes that actually cross HBM between
  kernels).  The buffer-level number is the roofline numerator; the gap
  between the two is the resolution of the r3 "549 GB/s > measured
  387-512 GB/s" tension (VERDICT r3 weak #3).

Run on the TPU:
  MP_PROGRAM=fusion_pgd python benchmarks/mfu_programs.py
  MP_PROGRAM=patch      python benchmarks/mfu_programs.py

Env: MP_PROGRAM (fusion_pgd|patch), MP_SIZE (1024), MP_K (2 for
fusion_pgd / 5 for patch), MP_CALLS (3), MP_REMAT (0), MP_REMAT_MIN_RES
(0=off), MP_BF16_PARAMS (0), MP_BREAKDOWN (1: per-buffer HBM table of the
unrolled-K program — rows aggregate K step bodies + the one-time
prologue), MP_TINY (CPU smoke at 32^2), MP_DUMP_HLO (path).

Output: one JSON line {sec_per_step, flops_per_step, hbm_bytes_per_step,
xla_bytes_per_step, achieved_tflops, achieved_GBps, mfu, roofline_bound,
roofline_util, sec_per_step_unrolled, ...}.  Lever experiments = re-runs
with MP_REMAT / MP_REMAT_MIN_RES / MP_BF16_PARAMS set (the
looped-vs-unrolled wall is a free fourth lever); results tabulated in
docs/DESIGN.md §9.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.mfu_whitebox import PEAKS  # chip roofline denominators


def log(msg: str) -> None:
    print(f"[mfu_programs] {msg}", file=sys.stderr, flush=True)


def build_fusion_pgd(pipeline, k: int, unroll: int = 1):
    """The benched fusion-aware PGD (bench.py's fusion_pgd submetric
    config: arithmetic mode, pixel objective, targeted) at ``k`` scan
    steps.  Returns (lower_args_fn, run_fn) where run_fn() executes one
    whole program and returns a scalar to fetch."""
    import jax
    import jax.numpy as jnp

    from tpufusion.attacks.fusion_attack import (
        FusionAttackConfig, make_fusion_attack,
    )
    from tpufusion.attacks.pgd import PGDConfig
    from tpufusion.fusion import n_inputs

    n = n_inputs(pipeline.dataset)
    size = pipeline.image_size
    cfg = FusionAttackConfig(
        mode="arithmetic", objective="pixel", targeted=True,
        pgd=PGDConfig(eps=0.06, alpha=0.01, steps=k, random_start=False,
                      unroll=unroll),
    )
    attack = make_fusion_attack(pipeline, cfg)
    imgs = jax.random.uniform(jax.random.key(1), (n, size, size, 3),
                              jnp.float32, -1, 1)
    target = imgs[:1]
    params = dict(enc=pipeline.enc_vars, gen=pipeline.drawer.gen_vars,
                  blend=pipeline.drawer.blend_params, vgg=pipeline.vgg_vars)
    key = jax.random.key(2)

    def lower():
        return attack.jitted.lower(imgs, key, params, target)

    def run():
        _adv, trace = attack(imgs, target, key)
        return trace[-1]

    return lower, run


def build_patch(pipeline, k: int, unroll: int = 1):
    """The benched patch-training step (bench.py's patch_train submetric
    config: 10% square patch, default reference loss weights) at ``k``
    inner iterations."""
    import jax
    import jax.numpy as jnp

    from tpufusion.attacks.patch import (
        PatchConfig, init_patch_square, make_patch_attack_step,
    )

    size = pipeline.image_size
    cfg = PatchConfig(patch_frac=0.1, max_count=k, unroll=unroll)
    step = make_patch_attack_step(pipeline, cfg)
    patch = init_patch_square(size, 0.1, jax.random.key(8))
    img = jax.random.uniform(jax.random.key(1), (1, size, size, 3),
                             jnp.float32, -1, 1)
    params = dict(enc=pipeline.enc_vars, gen=pipeline.drawer.gen_vars,
                  vgg=pipeline.vgg_vars)
    tgt = jnp.zeros((1, size, size, 3))
    key = jax.random.key(3)

    def lower():
        return step.jitted.lower(params, tgt, img, patch, key)

    def run():
        _p, trace = step(img, patch, key)
        return trace[-1]

    return lower, run


BUILDERS = {"fusion_pgd": build_fusion_pgd, "patch": build_patch}


def cost_and_time(lower, run, calls: int):
    """Compile via ``lower``, read XLA cost analysis, and time ``calls``
    whole-program executions steady-state (median of 3 rounds).  Returns
    (flops, bytes, sec_per_call, compiled)."""
    compiled = lower().compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    nbytes = float(ca.get("bytes accessed", 0.0))

    _ = float(run())  # warmup (scalar fetch is the tunnel's only barrier)
    times = []
    for _r in range(3):
        t0 = time.time()
        for _c in range(calls):
            out = run()
        _ = float(out)
        times.append((time.time() - t0) / calls)
    return flops, nbytes, sorted(times)[1], compiled


def main() -> int:
    import jax
    import jax.numpy as jnp

    from benchmarks.common import bf16_params, setup_cache

    tiny = os.environ.get("MP_TINY", "0") == "1"
    setup_cache(tiny=tiny)

    program = os.environ.get("MP_PROGRAM", "fusion_pgd")
    if program not in BUILDERS:
        log(f"unknown MP_PROGRAM {program!r} (want one of {sorted(BUILDERS)})")
        return 2
    size = int(os.environ.get("MP_SIZE", "32" if tiny else "1024"))
    k = int(os.environ.get("MP_K", "5" if program == "patch" else "2"))
    calls = int(os.environ.get("MP_CALLS", "3"))
    remat = os.environ.get("MP_REMAT", "0") == "1"
    remat_min_res = int(os.environ.get("MP_REMAT_MIN_RES", "0")) or None

    from tpufusion.pipeline import FusionPipeline, create_test_pipeline

    t0 = time.time()
    if tiny:
        pipeline = create_test_pipeline("ffhq", jax.random.key(0), size=size)
    else:
        pipeline = FusionPipeline.create(
            "ffhq", jax.random.key(0), size=size, remat=remat,
            remat_min_res=remat_min_res, mean_latent_samples=64)
    log(f"pipeline ({size}^2, remat={remat}, min_res={remat_min_res}) "
        f"in {time.time() - t0:.1f}s")

    if os.environ.get("MP_BF16_PARAMS", "0") == "1":
        pipeline.enc_vars = bf16_params(pipeline.enc_vars)
        pipeline.drawer.gen_vars = bf16_params(pipeline.drawer.gen_vars)
        pipeline.vgg_vars = bf16_params(pipeline.vgg_vars)
        log("params pre-cast to bf16")

    from benchmarks.hbm_breakdown import (
        format_breakdown, hbm_traffic_breakdown,
    )

    build = BUILDERS[program]
    results = {}
    for steps, unroll in ((k, 1), (2 * k, 1), (k, k), (2 * k, 2 * k)):
        lower, run = build(pipeline, steps, unroll)
        t0 = time.time()
        flops, nbytes, sec, compiled = cost_and_time(lower, run, calls)
        hbm = hbm_traffic_breakdown(compiled.as_text(), top=20)
        log(f"{program} steps={steps} unroll={unroll}: compile+3x{calls} "
            f"runs in {time.time() - t0:.1f}s; {sec * 1000:.1f} ms/call, "
            f"{flops / 1e12:.2f} TF, {nbytes / 1e9:.2f} GB xla, "
            f"{hbm['total_gb']:.2f} GB buffers per call")
        results[(steps, unroll)] = (flops, nbytes, sec, hbm, compiled)

    f1, x1, s1l, h1, _ = results[(k, 1)]
    f1u, x1u, s1u, h1u, c1u = results[(k, k)]
    f2, x2, s2l, h2, _ = results[(2 * k, 1)]
    f2u, x2u, s2u, h2u, _ = results[(2 * k, 2 * k)]

    sec_step = (s2l - s1l) / k            # production (looped) wall
    sec_step_unrolled = (s2u - s1u) / k   # unroll lever
    flops_step = (f2u - f1u) / k          # exact: unrolled bodies counted
    xla_bytes_step = (x2u - x1u) / k
    hbm_bytes_step = (h2u["total_gb"] - h1u["total_gb"]) * 1e9 / k
    if sec_step <= 0:
        log("WARNING: non-positive marginal step time — raise MP_K "
            "(per-call dispatch noise exceeds K steps of device work)")
    if abs(f2 - f1) > 0.01 * max(f1, 1.0):
        log("NOTE: looped-program cost deltas are non-zero — XLA counted "
            "the while body by trip count here; unrolled numbers still "
            "used for consistency")

    breakdown = None
    if os.environ.get("MP_BREAKDOWN", "1") == "1":
        dump = os.environ.get("MP_DUMP_HLO")
        if dump:
            with open(dump, "w") as f:
                f.write(c1u.as_text())
            log(f"optimized HLO (steps={k}, unrolled) -> {dump}")
        breakdown = h1u  # rows aggregate K bodies + prologue
        print(format_breakdown(breakdown, top=15), file=sys.stderr,
              flush=True)

    peak = PEAKS["v5e_bf16"]
    bw = PEAKS["v5e_hbm_Bps"]
    achieved = flops_step / sec_step if sec_step > 0 else 0.0
    t_flops = flops_step / peak
    t_bw = hbm_bytes_step / bw
    t_roofline = max(t_flops, t_bw)
    result = {
        "metric": f"{program} per-step roofline, {size}^2 (marginal K={k})",
        "sec_per_step": round(sec_step, 5),
        "steps_per_sec": round(1.0 / sec_step, 2) if sec_step > 0 else None,
        "sec_per_step_unrolled": round(sec_step_unrolled, 5),
        "flops_per_step": flops_step,
        "hbm_bytes_per_step": hbm_bytes_step,
        "xla_bytes_per_step": xla_bytes_step,
        "achieved_tflops": round(achieved / 1e12, 2),
        "achieved_GBps": round(hbm_bytes_step / sec_step / 1e9, 1)
        if sec_step > 0 else None,
        "xla_counted_GBps": round(xla_bytes_step / sec_step / 1e9, 1)
        if sec_step > 0 else None,
        "mfu": round(achieved / peak, 4),
        "roofline_bound": "bandwidth" if t_bw > t_flops else "compute",
        "roofline_sec": round(t_roofline, 5),
        "roofline_util": round(t_roofline / sec_step, 4)
        if sec_step > 0 else None,
        "prologue_sec": round(s1l - sec_step * k, 4),
        "remat": remat,
        "remat_min_res": remat_min_res,
        "bf16_params": os.environ.get("MP_BF16_PARAMS", "0") == "1",
        "hbm_breakdown": breakdown,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
