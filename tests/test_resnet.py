"""ResNet classifier tests (C13 attacked model) + converter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufusion.core.dtypes import Policy
from tpufusion.models.resnet import ResNet, convert_resnet18_checkpoint, create_resnet18

FP32 = Policy()


class TestResNet:
    @pytest.fixture(scope="class")
    def model(self):
        return create_resnet18(jax.random.key(0), num_classes=2,
                               image_size=64, policy=FP32)

    def test_logits_shape(self, model):
        m, v = model
        x = jax.random.uniform(jax.random.key(1), (3, 64, 64, 3), minval=-1, maxval=1)
        logits = jax.jit(m.apply)(v, x)
        assert logits.shape == (3, 2)
        assert bool(jnp.all(jnp.isfinite(logits)))

    def test_grad_to_input(self, model):
        m, v = model

        @jax.jit
        def g(v_, x):
            return jax.grad(
                lambda xx: jnp.mean(jax.nn.log_softmax(m.apply(v_, xx))[:, 0])
            )(x)

        x = jax.random.uniform(jax.random.key(2), (1, 64, 64, 3), minval=-1, maxval=1)
        grad = g(v, x)
        assert bool(jnp.any(grad != 0))

    def test_torchvision_conversion(self):
        """Synthetic torchvision-layout resnet18 state dict converts 1:1."""
        m = ResNet(num_classes=2, policy=FP32)
        _, ref = create_resnet18(jax.random.key(0), num_classes=2,
                                 image_size=64, policy=FP32)
        rng = np.random.RandomState(0)
        state = {"conv1.weight": rng.randn(64, 3, 7, 7).astype(np.float32)}
        for n in ("weight", "bias", "running_mean", "running_var"):
            state[f"bn1.{n}"] = rng.rand(64).astype(np.float32) + 0.5
        cin = 64
        for s, blocks in enumerate(m.stage_sizes):
            feats = 64 * 2**s
            for b in range(blocks):
                pre = f"layer{s + 1}.{b}"
                state[f"{pre}.conv1.weight"] = rng.randn(feats, cin, 3, 3).astype(np.float32)
                state[f"{pre}.conv2.weight"] = rng.randn(feats, feats, 3, 3).astype(np.float32)
                for bn in ("bn1", "bn2"):
                    for n in ("weight", "bias", "running_mean", "running_var"):
                        state[f"{pre}.{bn}.{n}"] = rng.rand(feats).astype(np.float32) + 0.5
                if cin != feats:
                    state[f"{pre}.downsample.0.weight"] = rng.randn(feats, cin, 1, 1).astype(np.float32)
                    for n in ("weight", "bias", "running_mean", "running_var"):
                        state[f"{pre}.downsample.1.{n}"] = rng.rand(feats).astype(np.float32) + 0.5
                cin = feats
        state["fc.weight"] = rng.randn(2, 512).astype(np.float32)
        state["fc.bias"] = rng.randn(2).astype(np.float32)

        variables = convert_resnet18_checkpoint(state, m)
        flat_ref = dict(jax.tree_util.tree_leaves_with_path(ref["params"]))
        flat_new = dict(jax.tree_util.tree_leaves_with_path(variables["params"]))
        assert set(flat_ref) == set(flat_new)
        for path, leaf in flat_ref.items():
            assert flat_new[path].shape == leaf.shape, path
        out = jax.jit(m.apply)(variables, jnp.zeros((1, 64, 64, 3)))
        assert out.shape == (1, 2)
