"""Fusion-aware attack tests — differentiating through the full pipeline
(BASELINE configs 1-3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufusion.attacks.fusion_attack import (
    FusionAttackConfig,
    fgsm_on_fusion,
    make_fused_image_fn,
    make_fusion_attack,
)
from tpufusion.attacks.pgd import PGDConfig
from tpufusion.fusion import arithmetic_fusion, n_inputs, spatial_fusion
from tpufusion.pipeline import create_test_pipeline
from tpufusion.runner import generate_inputs


@pytest.fixture(scope="module")
def pipeline():
    return create_test_pipeline("church", jax.random.key(0), size=32)


@pytest.fixture(scope="module")
def batch(pipeline):
    n = n_inputs("church")
    inputs = generate_inputs(pipeline, n, jax.random.key(1))
    target = jax.random.uniform(jax.random.key(2), (1, 32, 32, 3), minval=-1, maxval=1)
    return inputs, target


class TestFusedImageFn:
    def test_arithmetic_matches_fusion_op(self, pipeline, batch):
        inputs, _ = batch
        fused_fn = make_fused_image_fn(pipeline, "arithmetic")
        params = dict(enc=pipeline.enc_vars, gen=pipeline.drawer.gen_vars,
                      blend=pipeline.drawer.blend_params, vgg=pipeline.vgg_vars)
        f = jax.jit(fused_fn)(params, inputs)
        ref, _, _ = arithmetic_fusion(pipeline.drawer, pipeline.get_latents(inputs))
        np.testing.assert_allclose(np.asarray(f), np.asarray(ref), atol=1e-4)

    def test_spatial_matches_fusion_op(self, pipeline, batch):
        inputs, _ = batch
        fused_fn = make_fused_image_fn(pipeline, "spatial")
        params = dict(enc=pipeline.enc_vars, gen=pipeline.drawer.gen_vars,
                      blend=pipeline.drawer.blend_params, vgg=pipeline.vgg_vars)
        f = jax.jit(fused_fn)(params, inputs)
        ref, _, _ = spatial_fusion(pipeline.drawer, pipeline.get_latents(inputs))
        np.testing.assert_allclose(np.asarray(f), np.asarray(ref), atol=1e-4)


class TestFusionAttack:
    def test_pgd_on_arithmetic_fusion_descends(self, pipeline, batch):
        """BASELINE config 2: PGD toward a target fused image."""
        inputs, target = batch
        cfg = FusionAttackConfig(
            mode="arithmetic", objective="pixel", targeted=True,
            pgd=PGDConfig(eps=0.1, alpha=0.02, steps=5, random_start=False),
        )
        attack = make_fusion_attack(pipeline, cfg)
        adv, trace = attack(inputs, target, jax.random.key(3))
        assert adv.shape == inputs.shape
        assert float(jnp.max(jnp.abs(adv - inputs))) <= 0.1 + 1e-5
        assert float(trace[-1]) < float(trace[0])  # fused image approaches target

    def test_spatial_vgg_objective(self, pipeline, batch):
        """BASELINE config 3: spatial fusion, VGG perceptual objective."""
        inputs, target = batch
        cfg = FusionAttackConfig(
            mode="spatial", objective="vgg", targeted=True,
            pgd=PGDConfig(eps=0.1, alpha=0.03, steps=3, random_start=False),
        )
        attack = make_fusion_attack(pipeline, cfg)
        adv, trace = attack(inputs, target, jax.random.key(4))
        assert float(trace[-1]) < float(trace[0])

    def test_fgsm_single_step(self, pipeline, batch):
        """BASELINE config 1: 1-step FGSM on arithmetic fusion."""
        inputs, target = batch
        attack = fgsm_on_fusion(pipeline, eps=0.05)
        adv, trace = attack(inputs, target, jax.random.key(5))
        delta = np.asarray(jnp.abs(adv - inputs))
        assert delta.max() <= 0.05 + 1e-5
        assert trace.shape == (1,)

    def test_untargeted_flees_benign(self, pipeline, batch):
        inputs, _ = batch
        benign, _, _ = arithmetic_fusion(pipeline.drawer, pipeline.get_latents(inputs))
        cfg = FusionAttackConfig(
            mode="arithmetic", objective="pixel", targeted=False,
            pgd=PGDConfig(eps=0.1, alpha=0.02, steps=5, random_start=False),
        )
        attack = make_fusion_attack(pipeline, cfg)
        adv, trace = attack(inputs, jnp.asarray(benign), jax.random.key(6))
        assert float(trace[-1]) > float(trace[0])  # drifted away from benign

    def test_bad_configs_raise(self, pipeline):
        with pytest.raises(ValueError):
            make_fused_image_fn(pipeline, "bogus")
        with pytest.raises(ValueError):
            make_fusion_attack(pipeline, FusionAttackConfig(objective="bogus"))
