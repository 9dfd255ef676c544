"""Generator (C2) behaviour tests — API surface of SFGenerator/_hook.

NB: this host has one CPU core; everything is jitted and sized 32^2 so the
persistent compile cache keeps reruns fast.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufusion.core.dtypes import Policy
from tpufusion.models.stylegan2 import Generator, create_generator

FP32 = Policy()


@pytest.fixture(scope="module")
def gen32():
    gen, variables = create_generator(32, jax.random.key(0), channel_multiplier=1, policy=FP32)
    fns = {
        "fwd": jax.jit(lambda v, z: gen.apply(v, [z])),
        "fwd_latents": jax.jit(lambda v, z: gen.apply(v, [z], return_latents=True)),
        "fwd_wplus": jax.jit(lambda v, w: gen.apply(v, [w], input_is_latent=True)),
        "styles": jax.jit(lambda v, z: gen.apply(v, [z], return_style_vector=True)),
        "from_s": jax.jit(lambda v, s: gen.apply(v, style_vector=s)),
    }
    return gen, variables, fns


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
    def test_z_to_image_shape(self, gen32):
        gen, variables, fns = gen32
        z = jax.random.normal(jax.random.key(1), (2, 512))
        out = fns["fwd"](variables, z)
        assert out.image.shape == (2, 32, 32, 3)
        assert len(out.features) == 4  # resolutions 4..32
        assert [f.shape[1] for f in out.features] == [4, 8, 16, 32]

    def test_deterministic_with_fixed_noise(self, gen32):
        gen, variables, fns = gen32
        z = jax.random.normal(jax.random.key(1), (1, 512))
        a = fns["fwd"](variables, z).image
        b = fns["fwd"](variables, z).image
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_return_latents(self, gen32):
        gen, variables, fns = gen32
        z = jax.random.normal(jax.random.key(1), (1, 512))
        out = fns["fwd_latents"](variables, z)
        assert out.latents.shape == (1, gen.n_latent, 512)

    def test_input_is_latent_w_plus(self, gen32):
        gen, variables, fns = gen32
        w_plus = jax.random.normal(jax.random.key(2), (1, gen.n_latent, 512))
        out = fns["fwd_wplus"](variables, w_plus)
        assert out.image.shape == (1, 32, 32, 3)

    def test_style_vector_roundtrip(self, gen32):
        """s = G(z, return_style_vector); G(style_vector=s) == G(z)."""
        gen, variables, fns = gen32
        z = jax.random.normal(jax.random.key(3), (1, 512))
        s = fns["styles"](variables, z)
        assert len(s) == gen.n_styles
        img_direct = fns["fwd"](variables, z).image
        img_from_s = fns["from_s"](variables, s).image
        np.testing.assert_allclose(
            np.asarray(img_direct), np.asarray(img_from_s), atol=1e-5
        )

    def test_truncation_pulls_to_mean(self, gen32):
        gen, variables, fns = gen32
        mean_w = jax.jit(
            lambda v, k: gen.apply(v, 256, k, method=Generator.mean_latent)
        )(variables, jax.random.key(9))
        assert mean_w.shape == (1, 512)
        z = jax.random.normal(jax.random.key(4), (1, 512))
        s_full = fns["styles"](variables, z)
        s_trunc = jax.jit(
            lambda v, z, m: gen.apply(
                v, [z], truncation=0.0, truncation_latent=m, return_style_vector=True
            )
        )(variables, z, mean_w)
        s_mean = jax.jit(
            lambda v, m: gen.apply(v, [m], input_is_latent=True, return_style_vector=True)
        )(variables, mean_w)
        # truncation=0 collapses to the mean latent exactly
        np.testing.assert_allclose(
            np.asarray(s_trunc[0]), np.asarray(s_mean[0]), atol=1e-4
        )
        assert not np.allclose(np.asarray(s_full[0]), np.asarray(s_trunc[0]))

    def test_jit_and_grad(self, gen32):
        """The attack loops differentiate through synthesis — must be jittable."""
        gen, variables, fns = gen32

        @jax.jit
        def loss_grad(w_plus):
            def loss(w):
                out = gen.apply(variables, [w], input_is_latent=True)
                return jnp.mean(out.image**2)

            return jax.grad(loss)(w_plus)

        w = jax.random.normal(jax.random.key(6), (1, gen.n_latent, 512))
        g = loss_grad(w)
        assert g.shape == w.shape
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_style_mixing(self, gen32):
        gen, variables, fns = gen32
        z1 = jax.random.normal(jax.random.key(7), (1, 512))
        z2 = jax.random.normal(jax.random.key(8), (1, 512))
        out = jax.jit(
            lambda v, a, b: gen.apply(v, [a, b], inject_index=5)
        )(variables, z1, z2)
        assert out.image.shape == (1, 32, 32, 3)
