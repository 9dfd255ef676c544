"""StyleGAN2 discriminator — reference C22.

The reference loads a stylegan2-ada ``D`` from ``ffhq.pkl``
(`attack_main2.py:934-938`) and (in commented-out scoring blocks,
`:1029-1032,1091-1094`) prints realism scores of benign vs adversarial fused
images.  This is the rosinality-architecture discriminator in NHWC flax:
conv stem -> residual downsample blocks -> minibatch-stddev -> final convs +
linears -> (N, 1) logits.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpufusion.core.dtypes import Policy, default_policy
from tpufusion.models.stylegan2 import EqualLinear, channel_map
from tpufusion.ops.upfirdn2d import blur, make_blur_kernel


class EqualConv(nn.Module):
    """Conv with equalized lr (scale 1/sqrt(fan_in)); optional 2x down."""

    features: int
    kernel: int = 3
    down: bool = False
    use_bias: bool = True
    activate: bool = True
    policy: Policy = dataclasses.field(default_factory=default_policy)

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        cin = x.shape[-1]
        w = self.param(
            "weight",
            lambda key, s: jax.random.normal(key, s, self.policy.param_dtype),
            (k, k, cin, self.features),
        )
        scale = 1.0 / math.sqrt(cin * k * k)
        wc = (w * scale).astype(x.dtype)
        if self.down:
            taps = make_blur_kernel((1, 3, 3, 1), gain=1.0)
            p = 2 + (k - 1)
            x = blur(x, taps, pad=((p + 1) // 2, p // 2))
            stride, pad = 2, "VALID"
            y = jax.lax.conv_general_dilated(
                x, wc, (stride, stride), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            y = jax.lax.conv_general_dilated(
                x, wc, (1, 1), ((k // 2, k // 2), (k // 2, k // 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            b = self.param(
                "bias", lambda key, s: jnp.zeros(s, self.policy.param_dtype),
                (self.features,),
            )
            y = y + b.astype(y.dtype)
        if self.activate:
            y = jax.nn.leaky_relu(y, 0.2) * math.sqrt(2.0)
        return y


class ResBlock(nn.Module):
    features: int
    policy: Policy = dataclasses.field(default_factory=default_policy)

    @nn.compact
    def __call__(self, x):
        y = EqualConv(x.shape[-1], 3, policy=self.policy, name="conv1")(x)
        y = EqualConv(self.features, 3, down=True, policy=self.policy, name="conv2")(y)
        skip = EqualConv(self.features, 1, down=True, use_bias=False,
                         activate=False, policy=self.policy, name="skip")(x)
        return (y + skip) / math.sqrt(2.0)


class Discriminator(nn.Module):
    size: int = 1024
    channel_multiplier: int = 2
    stddev_group: int = 4
    policy: Policy = dataclasses.field(default_factory=default_policy)

    @nn.compact
    def __call__(self, images):
        """images NHWC in [-1,1] -> (N, 1) realism logits."""
        ch = channel_map(self.size, self.channel_multiplier)
        dt = self.policy.compute_dtype
        x = EqualConv(ch[self.size], 1, policy=self.policy, name="from_rgb")(
            images.astype(dt)
        )
        res = self.size
        while res > 4:
            x = ResBlock(ch[res // 2], policy=self.policy, name=f"block_{res}")(x)
            res //= 2

        # minibatch stddev (group stat channel).  Group = min(batch,
        # stddev_group) when that divides the batch (the reference's only
        # supported case — its reshape hard-fails otherwise); for a
        # non-divisible batch we take the LARGEST divisor of n <= that,
        # keeping a meaningful cross-sample statistic instead of silently
        # degrading to a degenerate all-zero stddev channel (g=1).
        n, h, w, c = x.shape
        g = min(self.stddev_group, n)
        while n % g:
            g -= 1
        y = x.reshape(g, n // g, h, w, c).astype(jnp.float32)
        std = jnp.sqrt(jnp.var(y, axis=0) + 1e-8)
        std = jnp.mean(std, axis=(1, 2, 3), keepdims=True)
        std = jnp.tile(std, (g, h, w, 1))
        x = jnp.concatenate([x, std.astype(x.dtype)], axis=-1)

        x = EqualConv(ch[4], 3, policy=self.policy, name="final_conv")(x)
        x = x.reshape(n, -1)
        x = EqualLinear(ch[4], activate=True, policy=self.policy, name="final_fc")(x)
        return EqualLinear(1, policy=self.policy, name="out")(x)


def create_discriminator(
    size: int,
    key: jax.Array,
    *,
    channel_multiplier: int = 2,
    policy: Optional[Policy] = None,
):
    policy = policy or default_policy()
    d = Discriminator(size=size, channel_multiplier=channel_multiplier, policy=policy)
    variables = jax.jit(d.init)(key, jnp.zeros((1, size, size, 3), policy.compute_dtype))
    return d, variables


def realism_scores(d: Discriminator, variables, images) -> jax.Array:
    """The commented scoring hook (`attack_main2.py:1029-1032`):
    per-image D logits for benign/adversarial comparison."""
    return d.apply(variables, images)[:, 0]
