"""ResNet classifier — the attacked model of the classifier-transfer PGD/CW
recipes (reference C13).

The reference builds a torchvision ``resnet18`` with a 2-way head for the
FFHQ gender classifier (`interpolation.py:1296-1302`) and runs
``torchattacks.PGD(model, eps=8/255, alpha=0.01, steps=100)`` /
``CW(model, steps=200)`` against it (`:1343,1357`); cars use a ViT
(`:1355`).  This is the torchvision-layout ResNet in NHWC flax (frozen BN,
inference-mode — the classifier is always eval() in the reference) so the
``face_gender_classification_256_1.pth`` checkpoint can be converted
weight-for-weight.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpufusion.core.dtypes import Policy, default_policy
from tpufusion.models.e4e import FrozenBatchNorm


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    policy: Policy = dataclasses.field(default_factory=default_policy)

    @nn.compact
    def __call__(self, x):
        pd = self.policy.param_dtype
        y = nn.Conv(self.features, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=x.dtype, param_dtype=pd, name="conv1")(x)
        y = FrozenBatchNorm(param_dtype=pd, name="bn1")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=x.dtype, param_dtype=pd, name="conv2")(y)
        y = FrozenBatchNorm(param_dtype=pd, name="bn2")(y)
        if x.shape[-1] != self.features or self.stride != 1:
            x = nn.Conv(self.features, (1, 1), strides=self.stride, use_bias=False,
                        dtype=x.dtype, param_dtype=pd, name="down_conv")(x)
            x = FrozenBatchNorm(param_dtype=pd, name="down_bn")(x)
        return jax.nn.relu(y + x)


class ResNet(nn.Module):
    """torchvision-layout ResNet with BasicBlocks (resnet18/34)."""

    num_classes: int = 2
    stage_sizes: Sequence[int] = (2, 2, 2, 2)  # resnet18
    width: int = 64
    policy: Policy = dataclasses.field(default_factory=default_policy)

    @nn.compact
    def __call__(self, x):
        dt = self.policy.compute_dtype
        pd = self.policy.param_dtype
        y = nn.Conv(self.width, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=dt, param_dtype=pd, name="conv1")(x.astype(dt))
        y = FrozenBatchNorm(param_dtype=pd, name="bn1")(y)
        y = jax.nn.relu(y)
        # maxpool 3x3 stride 2 pad 1
        y = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)),
        )
        for s, n_blocks in enumerate(self.stage_sizes):
            feats = self.width * (2**s)
            for b in range(n_blocks):
                stride = 2 if (s > 0 and b == 0) else 1
                y = BasicBlock(feats, stride, policy=self.policy,
                               name=f"layer{s + 1}_{b}")(y)
        y = jnp.mean(y.astype(jnp.float32), axis=(1, 2))  # global avg pool
        return nn.Dense(self.num_classes, param_dtype=pd, name="fc")(y.astype(dt))


def create_resnet18(key: jax.Array, num_classes: int = 2, *,
                    image_size: int = 256, policy: Optional[Policy] = None):
    policy = policy or default_policy()
    model = ResNet(num_classes=num_classes, policy=policy)
    variables = jax.jit(model.init)(
        key, jnp.zeros((1, image_size, image_size, 3), policy.compute_dtype)
    )
    return model, variables


def convert_resnet18_checkpoint(state: dict, model: ResNet) -> dict:
    """torchvision resnet18 state dict -> our NHWC params."""
    import functools

    import numpy as np

    from tpufusion.io.checkpoint import torch_bn_params, torch_conv_kernel

    conv = torch_conv_kernel
    bn = functools.partial(torch_bn_params, state)

    p: dict = {
        "conv1": {"kernel": conv(state["conv1.weight"])},
        "bn1": bn("bn1"),
        "fc": {
            "kernel": np.transpose(np.asarray(state["fc.weight"]), (1, 0)),
            "bias": np.asarray(state["fc.bias"]),
        },
    }
    for s, n_blocks in enumerate(model.stage_sizes):
        for b in range(n_blocks):
            src = f"layer{s + 1}.{b}"
            blk = {
                "conv1": {"kernel": conv(state[f"{src}.conv1.weight"])},
                "bn1": bn(f"{src}.bn1"),
                "conv2": {"kernel": conv(state[f"{src}.conv2.weight"])},
                "bn2": bn(f"{src}.bn2"),
            }
            if f"{src}.downsample.0.weight" in state:
                blk["down_conv"] = {"kernel": conv(state[f"{src}.downsample.0.weight"])}
                blk["down_bn"] = bn(f"{src}.downsample.1")
            p[f"layer{s + 1}_{b}"] = blk
    return {"params": p}
