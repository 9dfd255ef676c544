"""Classifier adapter tests (C13 attacked models) — resnet + ViT + PGD/CW
against them."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufusion.attacks import CWConfig, PGDConfig, make_cw, make_pgd
from tpufusion.models.classifiers import (
    create_vit_classifier,
    load_gender_classifier,
)


class TestViTAdapter:
    @pytest.fixture(scope="class")
    def vit(self):
        return create_vit_classifier(
            num_labels=4, image_size=32, patch_size=8, hidden_size=32,
            num_layers=2, num_heads=2, intermediate_size=64,
        )

    def test_logits_shape_and_resize(self, vit):
        logits_fn, params = vit
        imgs = jax.random.uniform(jax.random.key(0), (2, 64, 64, 3), minval=-1, maxval=1)
        logits = jax.jit(logits_fn)(params, imgs)  # resized 64 -> 32 inside
        assert logits.shape == (2, 4)

    def test_pgd_against_vit(self, vit):
        """The reference's cars recipe: PGD on resized inputs
        (`interpolation.py:1355-1365`)."""
        logits_fn, params = vit
        imgs = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3), minval=-1, maxval=1)
        labels = jnp.argmax(jax.jit(logits_fn)(params, imgs), -1)

        def ce(adv, params_, labels_):
            logp = jax.nn.log_softmax(logits_fn(params_, adv).astype(jnp.float32))
            return -jnp.mean(jnp.take_along_axis(logp, labels_[:, None], -1))

        attack = make_pgd(ce, PGDConfig(eps=0.1, alpha=0.02, steps=5))
        adv, trace = attack(imgs, jax.random.key(2), params, labels)
        assert float(jnp.max(jnp.abs(adv - imgs))) <= 0.1 + 1e-5
        assert trace[-1] > trace[0]  # CE ascended

    def test_cw_against_vit(self, vit):
        logits_fn, params = vit
        imgs = jax.random.uniform(jax.random.key(3), (2, 32, 32, 3),
                                  minval=-0.5, maxval=0.5)
        labels = jnp.argmax(jax.jit(logits_fn)(params, imgs), -1)
        attack = make_cw(lambda x: logits_fn(params, x),
                         CWConfig(c=1.0, steps=30, lr=0.05))
        adv, best_l2 = attack(imgs, labels)
        assert adv.shape == imgs.shape


class TestViTBackendResolution:
    """'auto' keeps flax-only HF dirs loadable while preferring native."""

    def test_no_dir_is_native(self):
        from tpufusion.models.classifiers import resolve_vit_backend

        assert resolve_vit_backend(None) == "native"

    def test_torch_weights_prefer_native(self, tmp_path):
        from tpufusion.models.classifiers import resolve_vit_backend

        (tmp_path / "pytorch_model.bin").write_bytes(b"x")
        (tmp_path / "flax_model.msgpack").write_bytes(b"x")
        assert resolve_vit_backend(str(tmp_path)) == "native"

    def test_flax_only_dir_falls_back(self, tmp_path):
        from tpufusion.models.classifiers import resolve_vit_backend

        (tmp_path / "flax_model.msgpack").write_bytes(b"x")
        assert resolve_vit_backend(str(tmp_path)) == "flax_hf"

    def test_missing_weights_raises_with_hint(self, tmp_path):
        with pytest.raises(FileNotFoundError, match="flax_hf"):
            create_vit_classifier(
                num_labels=4, image_size=32, patch_size=8, hidden_size=32,
                num_layers=2, num_heads=2, intermediate_size=64,
                pretrained_dir=str(tmp_path), backend="native",
            )


class TestGenderClassifier:
    def test_random_init_logits(self):
        logits_fn, variables = load_gender_classifier(None)
        imgs = jax.random.uniform(jax.random.key(0), (2, 256, 256, 3),
                                  minval=-1, maxval=1)
        logits = jax.jit(logits_fn)(variables, imgs)
        assert logits.shape == (2, 2)
