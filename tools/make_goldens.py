"""Mint golden npz fixtures for tests/goldens/ (SURVEY §4 oracle strategy).

Pins the reference's determinism contract at more than one resolution: the
original 32² goldens caught seed/noise regressions, but resolution-dependent
plumbing — upfirdn padding across synthesis blocks, noise indexing as the
layer count grows, the conv plan at larger feature maps — is invisible at
32² (VERDICT r4 weak #5).  This tool regenerates the committed goldens on
CPU fp32 / highest matmul precision (the same pins as tests/conftest.py);
``tools/tpu_drift_check.py`` replays the SAME npz on the real TPU chip and
reports the CPU↔TPU drift against the documented tolerance.

The npz stores the *inputs* (z / W+ rows) next to the outputs, so the paired
test replays exactly what is committed — the sampling recipe below only
matters when minting a brand-new golden.

Usage:  python tools/make_goldens.py --size 128 [--out tests/goldens]
"""

from __future__ import annotations

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# the axon TPU plugin ignores the JAX_PLATFORMS env var — force CPU here
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def mint_generator(size: int, out_dir: str) -> str:
    """generator_<size>_seed42.npz — init seed 42, z from seed 43."""
    from tpufusion.core.dtypes import Policy
    from tpufusion.models import create_generator

    gen, variables = create_generator(
        size, jax.random.key(42), channel_multiplier=1, policy=Policy())
    z = jax.random.normal(jax.random.key(43), (2, 512))
    img = jax.jit(lambda v, z_: gen.apply(v, [z_]).image)(variables, z)
    path = os.path.join(out_dir, f"generator_{size}_seed42.npz")
    np.savez_compressed(path, image=np.asarray(img, np.float32),
                        z=np.asarray(z, np.float32))
    return path


def mint_fusion(dataset: str, size: int, out_dir: str) -> str:
    """fusion_<dataset>_<size>_seed7.npz — drawer init seed 7, W+ rows from
    z ~ N(0,1) (seed 7) pushed through the mapping net."""
    from tpufusion.fusion.arithmetic import arithmetic_fusion
    from tpufusion.fusion.drawer import FusionDrawer
    from tpufusion.fusion.spatial import n_inputs, spatial_fusion

    drawer = FusionDrawer.create(
        dataset, jax.random.key(7), size=size, channel_multiplier=1,
        mean_latent_samples=8)
    z = jax.random.normal(jax.random.key(7), (n_inputs(dataset), 512))
    w = drawer.z_to_w_plus(z)
    fused_sp, singles, _ = spatial_fusion(drawer, w)
    fused_ar, _, _ = arithmetic_fusion(drawer, w)
    path = os.path.join(out_dir, f"fusion_{dataset}_{size}_seed7.npz")
    np.savez_compressed(
        path, w=np.asarray(w, np.float32),
        fused_spatial=np.asarray(fused_sp, np.float32),
        fused_arith=np.asarray(fused_ar, np.float32),
        singles=np.asarray(singles, np.float32))
    return path


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "goldens"))
    p.add_argument("--datasets", nargs="*",
                   default=["ffhq", "car", "church"])
    args = p.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)
    print(f"backend={jax.default_backend()} size={args.size}")
    print("wrote", mint_generator(args.size, args.out))
    for ds in args.datasets:
        print("wrote", mint_fusion(ds, args.size, args.out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
