"""FusionPipeline bundle tests — persistence + cars trim."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufusion.core.dtypes import Policy
from tpufusion.pipeline import FusionPipeline, create_test_pipeline


class TestPipelinePersistence:
    def test_save_load_roundtrip(self, tmp_path):
        pipe = create_test_pipeline("church", jax.random.key(3), size=32)
        x = jax.random.uniform(jax.random.key(4), (1, 32, 32, 3), minval=-1, maxval=1)
        codes_before = np.asarray(pipe.get_latents(x))
        img_before = np.asarray(pipe.decode(jnp.asarray(codes_before)))

        pipe.save(str(tmp_path / "ckpt"))
        loaded = FusionPipeline.load(str(tmp_path / "ckpt"), policy=Policy())
        codes_after = np.asarray(loaded.get_latents(x))
        img_after = np.asarray(loaded.decode(jnp.asarray(codes_after)))
        np.testing.assert_allclose(codes_before, codes_after, atol=1e-5)
        np.testing.assert_allclose(img_before, img_after, atol=1e-4)


class TestCarsTrim:
    def test_get_latents_trims_18_to_16(self):
        """`attack_main2.py:144-145`: an 18-row encoder on cars trims to 16."""
        pipe = FusionPipeline.create(
            "car", jax.random.key(5), size=32, channel_multiplier=1,
            policy=Policy(), mean_latent_samples=8, encoder_base_channels=16,
            encoder_units=(1, 1, 1, 1), encoder_input_size=32,
        )
        assert pipe.is_cars
        # car generator has 16 latents -> encoder n_styles == 16 (no trim)
        x = jnp.zeros((1, 32, 32, 3))
        assert pipe.get_latents(x).shape[1] == pipe.generator.n_latent
        # force the 18-row case through the trim logic directly
        from tpufusion.models.e4e import get_latents as raw_get_latents

        class _Enc:
            def apply(self, v, xx):
                return jnp.zeros((1, 18, 512))

        out = raw_get_latents(_Enc(), None, x, jnp.zeros((18, 512)), is_cars=True)
        assert out.shape[1] == 16


class TestProgramExport:
    """AOT serving artifacts (io/export.py): exported programs must
    reproduce the live pipeline bit-for-tolerance after a disk roundtrip."""

    def test_decode_export_roundtrip(self, tmp_path):
        import numpy as np

        from tpufusion.io import export_decode, load_program
        from tpufusion.pipeline import create_test_pipeline

        pipe = create_test_pipeline("church", jax.random.key(0), size=32)
        path = export_decode(pipe, str(tmp_path / "decode.jexp"), batch=2)
        dec = load_program(path)
        codes = jax.random.normal(
            jax.random.key(1), (2, pipe.generator.n_latent, 512)) * 0.2
        ref = pipe.decode_fn()(pipe.drawer.gen_vars, codes)
        out = dec(pipe.drawer.gen_vars, codes)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_spatial_fusion_export_roundtrip(self, tmp_path):
        import os

        import numpy as np

        from tpufusion.fusion.drawer import SWAP_TABLE
        from tpufusion.fusion.spatial import ROLE_MAPS, spatial_fusion
        from tpufusion.io import export_spatial_fusion, load_program
        from tpufusion.pipeline import create_test_pipeline

        pipe = create_test_pipeline("church", jax.random.key(0), size=32)
        drawer = pipe.drawer
        path = export_spatial_fusion(drawer, str(tmp_path / "fusion.jexp"))
        assert os.path.exists(path + ".roles")
        fuse = load_program(path)
        cfg = ROLE_MAPS["church"]
        lat = jax.random.normal(
            jax.random.key(2),
            (len(cfg["roles"]), drawer.generator.n_latent, 512)) * 0.2
        ref_img, _, _ = spatial_fusion(drawer, lat)
        by_role = {r: lat[i][None] for i, r in enumerate(cfg["roles"])}
        provided = [k for k, _ in SWAP_TABLE if k in cfg["kwargs"]]
        out_img = fuse(
            drawer.gen_vars, drawer.blend_params, drawer.mean_latent,
            by_role[cfg["base"]],
            *(by_role[cfg["kwargs"][k]] for k in provided))
        np.testing.assert_allclose(np.asarray(out_img), np.asarray(ref_img),
                                   atol=1e-5)
