"""Golden-value regression tests — the framework analog of the reference's
determinism pinning + committed golden images (SURVEY §4): fixed seeds, fixed
noise buffers, byte-stable outputs across runs.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufusion.core.dtypes import Policy
from tpufusion.models import create_generator

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


class TestGenerartorGolden:
    @pytest.mark.parametrize("size", [
        32,
        pytest.param(128, marks=pytest.mark.slow),
    ])
    def test_fixed_seed_generator_matches_golden(self, size):
        """Same init seed + same z must reproduce the committed activations
        (CPU fp32, highest matmul precision — pinned in conftest).  128² pins
        resolution-dependent plumbing the 32² golden cannot see — upfirdn
        padding across more synthesis blocks, noise indexing at a deeper
        layer stack (VERDICT r4 weak #5; minted by tools/make_goldens.py,
        TPU drift via tools/tpu_drift_check.py)."""
        with np.load(os.path.join(GOLDEN_DIR,
                                  f"generator_{size}_seed42.npz")) as g:
            golden_img, z = g["image"], g["z"]
        gen, variables = create_generator(
            size, jax.random.key(42), channel_multiplier=1, policy=Policy()
        )
        img = jax.jit(lambda v, z_: gen.apply(v, [z_]).image)(
            variables, jnp.asarray(z)
        )
        np.testing.assert_allclose(np.asarray(img), golden_img, atol=2e-4, rtol=2e-4)

    def test_noise_buffers_deterministic_across_builds(self):
        """randomize_noise=False semantics: two independent inits share the
        same noise buffers (they are keyed by layer index, not by init key)."""
        _, v1 = create_generator(32, jax.random.key(0), channel_multiplier=1, policy=Policy())
        _, v2 = create_generator(32, jax.random.key(99), channel_multiplier=1, policy=Policy())
        for k in v1["noise"]:
            np.testing.assert_array_equal(
                np.asarray(v1["noise"][k]), np.asarray(v2["noise"][k])
            )


class TestFusionGolden:
    @pytest.mark.parametrize("size", [
        32,
        pytest.param(128, marks=pytest.mark.slow),
    ])
    @pytest.mark.parametrize("dataset", ["ffhq", "car", "church"])
    def test_fixed_seed_fusion_matches_golden(self, dataset, size):
        """Drawer-level pin: same init seed + same W+ rows must reproduce the
        committed spatial AND arithmetic fused images (full hierarchy blend +
        synthesis) for every dataset tree — at 32² and (slow tier) 128²."""
        from tpufusion.fusion.arithmetic import arithmetic_fusion
        from tpufusion.fusion.drawer import FusionDrawer
        from tpufusion.fusion.spatial import spatial_fusion

        with np.load(os.path.join(GOLDEN_DIR,
                                  f"fusion_{dataset}_{size}_seed7.npz")) as g:
            w = jnp.asarray(g["w"])
            golden_sp, golden_ar = g["fused_spatial"], g["fused_arith"]
            golden_singles = g["singles"]
        drawer = FusionDrawer.create(
            dataset, jax.random.key(7), size=size, channel_multiplier=1,
            mean_latent_samples=8,
        )
        fused_sp, singles, _ = spatial_fusion(drawer, w)
        fused_ar, _, _ = arithmetic_fusion(drawer, w)
        np.testing.assert_allclose(np.asarray(fused_sp), golden_sp, atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(fused_ar), golden_ar, atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(singles), golden_singles, atol=2e-4, rtol=2e-4)
