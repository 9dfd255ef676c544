"""Generator (C2) behaviour tests — API surface of SFGenerator/_hook."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufusion.core.dtypes import Policy
from tpufusion.models.stylegan2 import Generator, create_generator

FP32 = Policy()


@pytest.fixture(scope="module")
def gen64():
    gen, variables = create_generator(64, jax.random.key(0), channel_multiplier=1, policy=FP32)
    return gen, variables


class TestGeneratorStructure:
    def test_n_latent(self):
        assert Generator(size=1024, policy=FP32).n_latent == 18
        assert Generator(size=512, policy=FP32).n_latent == 16
        assert Generator(size=256, policy=FP32).n_latent == 14

    def test_n_styles(self):
        # 1024: 17 convs + 9 to_rgbs = 26
        assert Generator(size=1024, policy=FP32).n_styles == 26
        assert Generator(size=64, policy=FP32).n_styles == 14


class TestGeneratorForward:
    def test_z_to_image_shape(self, gen64):
        gen, variables = gen64
        z = jax.random.normal(jax.random.key(1), (2, 512))
        out = gen.apply(variables, [z])
        assert out.image.shape == (2, 64, 64, 3)
        assert len(out.features) == 5  # resolutions 4..64

    def test_deterministic_with_fixed_noise(self, gen64):
        gen, variables = gen64
        z = jax.random.normal(jax.random.key(1), (1, 512))
        a = gen.apply(variables, [z]).image
        b = gen.apply(variables, [z]).image
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_return_latents(self, gen64):
        gen, variables = gen64
        z = jax.random.normal(jax.random.key(1), (1, 512))
        out = gen.apply(variables, [z], return_latents=True)
        assert out.latents.shape == (1, gen.n_latent, 512)

    def test_input_is_latent_w_plus(self, gen64):
        gen, variables = gen64
        w_plus = jax.random.normal(jax.random.key(2), (1, 10, 512))
        out = gen.apply(variables, [w_plus], input_is_latent=True)
        assert out.image.shape == (1, 64, 64, 3)

    def test_style_vector_roundtrip(self, gen64):
        """s = G(z, return_style_vector); G(style_vector=s) == G(z)."""
        gen, variables = gen64
        z = jax.random.normal(jax.random.key(3), (1, 512))
        s = gen.apply(variables, [z], return_style_vector=True)
        assert len(s) == gen.n_styles
        img_direct = gen.apply(variables, [z]).image
        img_from_s = gen.apply(variables, style_vector=s).image
        np.testing.assert_allclose(
            np.asarray(img_direct), np.asarray(img_from_s), atol=1e-5
        )

    def test_truncation_pulls_to_mean(self, gen64):
        gen, variables = gen64
        mean_w = gen.apply(
            variables, 4096, jax.random.key(9), method=Generator.mean_latent
        )
        assert mean_w.shape == (1, 512)
        z = jax.random.normal(jax.random.key(4), (1, 512))
        s_full = gen.apply(variables, [z], return_style_vector=True)
        s_trunc = gen.apply(
            variables, [z], truncation=0.0, truncation_latent=mean_w,
            return_style_vector=True,
        )
        s_mean = gen.apply(
            variables, [mean_w], input_is_latent=True, return_style_vector=True
        )
        # truncation=0 collapses to the mean latent exactly
        np.testing.assert_allclose(
            np.asarray(s_trunc[0]), np.asarray(s_mean[0]), atol=1e-4
        )
        assert not np.allclose(np.asarray(s_full[0]), np.asarray(s_trunc[0]))

    def test_feature_resolutions(self, gen64):
        gen, variables = gen64
        z = jax.random.normal(jax.random.key(5), (1, 512))
        out = gen.apply(variables, [z])
        res = [f.shape[1] for f in out.features]
        assert res == [4, 8, 16, 32, 64]

    def test_jit_and_grad(self, gen64):
        """The attack loops differentiate through synthesis — must be jittable."""
        gen, variables = gen64

        @jax.jit
        def loss(w_plus):
            out = gen.apply(variables, [w_plus], input_is_latent=True)
            return jnp.mean(out.image**2)

        w = jax.random.normal(jax.random.key(6), (1, gen.n_latent, 512))
        g = jax.grad(loss)(w)
        assert g.shape == w.shape
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_style_mixing(self, gen64):
        gen, variables = gen64
        z1 = jax.random.normal(jax.random.key(7), (1, 512))
        z2 = jax.random.normal(jax.random.key(8), (1, 512))
        out = gen.apply(variables, [z1, z2], inject_index=5)
        assert out.image.shape == (1, 64, 64, 3)
