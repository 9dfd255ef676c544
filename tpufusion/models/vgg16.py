"""VGG16 perceptual feature extractor (reference ``code/vgg.py:6-81``).

The reference's ``VGGBase`` is the SSD-flavoured VGG16 (conv6/conv7 dilated
replacements for the FC layers) but its ``forward`` only runs through conv4_2
and returns four taps used as the perceptual loss:

    (relu(conv1_1), relu(conv1_2), pool2_output, relu(conv4_2))

NB the reference names the third tap ``conv3_2`` but it is actually the
*pool2 output* (`vgg.py:53-54` — assigned right after ``self.pool2``).  We
keep the same tap semantics (and the misleading name in the docstring only).

TPU-native: NHWC convs, bf16 compute with fp32 perceptual-loss accumulation,
and only the layers the forward pass needs are materialised (conv5/6/7 exist
solely for checkpoint-layout parity and are loaded but unused, matching
`vgg.py:73` which skips their pretrained init).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpufusion.core.dtypes import Policy, default_policy

# (name, out_channels) for the layers the perceptual forward actually uses.
_LAYERS = [
    ("conv1_1", 64),
    ("conv1_2", 64),
    ("conv2_1", 128),
    ("conv2_2", 128),
    ("conv3_1", 256),
    ("conv3_2", 256),
    ("conv3_3", 256),
    ("conv4_1", 512),
    ("conv4_2", 512),
]


def _max_pool(x, window=2, stride=2, ceil_mode=False):
    pad = ((0, 0), (0, 0))
    if ceil_mode:
        h, w = x.shape[1], x.shape[2]
        ph = (-h) % stride
        pw = (-w) % stride
        pad = ((0, ph), (0, pw))
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        ((0, 0),) + pad + ((0, 0),),
    )


class VGG16(nn.Module):
    """Perceptual tap stack; input NHWC in [-1, 1] (matches the reference,
    which feeds normalised tensors straight into VGG — `attack_main2.py:602`)."""

    policy: Policy = dataclasses.field(default_factory=default_policy)

    @nn.compact
    def __call__(self, x):
        dt = self.policy.compute_dtype
        out = x.astype(dt)
        taps = {}
        for name, ch in _LAYERS:
            out = nn.Conv(
                ch,
                (3, 3),
                padding=((1, 1), (1, 1)),
                dtype=dt,
                param_dtype=self.policy.param_dtype,
                name=name,
            )(out)
            out = jax.nn.relu(out)
            if name == "conv1_1":
                taps["conv1_1"] = out
            elif name == "conv1_2":
                taps["conv1_2"] = out
                out = _max_pool(out)  # pool1
            elif name == "conv2_2":
                out = _max_pool(out)  # pool2
                taps["pool2"] = out  # reference's misnamed 'conv3_2' tap
            elif name == "conv3_3":
                out = _max_pool(out, ceil_mode=True)  # pool3 (ceil)
            elif name == "conv4_2":
                taps["conv4_2"] = out
        return (
            taps["conv1_1"],
            taps["conv1_2"],
            taps["pool2"],
            taps["conv4_2"],
        )


def perceptual_distance(feats_a, feats_b, accum_dtype=jnp.float32):
    """Sum of per-tap MSEs — the reference's 4-term criterion sum
    (`attack_main2.py:626-635`)."""
    total = jnp.asarray(0.0, accum_dtype)
    for a, b in zip(feats_a, feats_b):
        d = a.astype(accum_dtype) - b.astype(accum_dtype)
        total = total + jnp.mean(d * d)
    return total


def create_vgg16(key: jax.Array, policy: Optional[Policy] = None, image_size: int = 256):
    policy = policy or default_policy()
    model = VGG16(policy=policy)
    variables = jax.jit(model.init)(key, jnp.zeros((1, image_size, image_size, 3), policy.compute_dtype))
    return model, variables
