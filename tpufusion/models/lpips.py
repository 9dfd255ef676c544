"""LPIPS perceptual distance (learned linear tap weights, VGG backbone).

The reference's legacy white-box variants ``optimize``/``optimize_copy``
score reconstructions with a true LPIPS network —
``lpips.LPIPS(net='vgg')`` at `/root/reference/code/attack/attack_main2.py:687,735`
— not the 4-tap MSE sum the active presets use.  This module is a
TPU-native rebuild of that public architecture (Zhang et al. 2018):

  1. inputs in [-1, 1] are shifted/scaled by the fixed ImageNet constants
     of the official ``ScalingLayer``;
  2. a standard VGG16 feature stack is tapped after
     relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3;
  3. each tap is unit-normalised over channels (eps 1e-10);
  4. squared differences pass through a learned 1x1, 1-output conv
     ("lin" head) and are spatially averaged;
  5. the five scalars are summed.

Weights load from the official torch layouts via
``convert_torch_lpips``: either the full ``LPIPS`` state dict
(``net.slice*`` backbone + ``lin*.model.*.weight``) or the pip package's
lin-only checkpoint (backbone supplied separately as a torchvision
``vgg16().features`` state dict).  Without checkpoints (this environment
has no lpips/torchvision and zero egress), ``create_lpips`` random-inits —
numerics are validated against an independent torch oracle in
``tests/torch_ref.py``.

TPU notes: NHWC, bf16-friendly compute with fp32 normalisation/accumulation
(the unit-normalise divides by an L2 norm — doing that in bf16 loses the
small-activation taps), all five taps from ONE backbone pass.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpufusion.core.dtypes import Policy, default_policy

# official ScalingLayer constants (applies to [-1, 1] inputs)
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)

# standard VGG16 conv plan: (name, out_ch); 'M' = maxpool before this conv
_VGG_PLAN = [
    ("conv1_1", 64), ("conv1_2", 64),
    ("M", 0), ("conv2_1", 128), ("conv2_2", 128),
    ("M", 0), ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256),
    ("M", 0), ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512),
    ("M", 0), ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512),
]
_TAPS = ("conv1_2", "conv2_2", "conv3_3", "conv4_3", "conv5_3")
TAP_CHANNELS = (64, 128, 256, 512, 512)


class LPIPS(nn.Module):
    """LPIPS('vgg') distance network; ``__call__(x0, x1) -> (B,) distance``.

    Inputs NHWC in [-1, 1] (the official net's convention; the reference
    feeds its normalised tensors directly, `attack_main2.py:702-706`)."""

    policy: Policy = dataclasses.field(default_factory=default_policy)

    def _backbone(self, x):
        dt = self.policy.compute_dtype
        shift = jnp.asarray(_SHIFT, jnp.float32)
        scale = jnp.asarray(_SCALE, jnp.float32)
        out = ((x.astype(jnp.float32) - shift) / scale).astype(dt)
        taps = []
        for name, ch in _VGG_PLAN:
            if name == "M":
                out = nn.max_pool(out, (2, 2), strides=(2, 2))
                continue
            out = nn.Conv(
                ch, (3, 3), padding=((1, 1), (1, 1)), dtype=dt,
                param_dtype=self.policy.param_dtype, name=name,
            )(out)
            out = jax.nn.relu(out)
            if name in _TAPS:
                taps.append(out)
        return taps

    @nn.compact
    def __call__(self, x0, x1):
        # one backbone pass over concat([x0, x1]) — flax params are defined
        # once, and the doubled batch keeps the MXU fuller than two passes
        b0 = x0.shape[0]
        taps = self._backbone(jnp.concatenate([x0, x1], axis=0))
        t0 = [t[:b0] for t in taps]
        t1 = [t[b0:] for t in taps]
        total = jnp.zeros(x0.shape[0], jnp.float32)
        for i, (a, b) in enumerate(zip(t0, t1)):
            a = _unit_normalize(a)
            b = _unit_normalize(b)
            d = (a - b) ** 2
            lin = self.param(f"lin{i}", nn.initializers.uniform(scale=0.1),
                             (d.shape[-1], 1), jnp.float32)
            # learned 1x1 conv == matmul over the channel axis
            per_px = jnp.squeeze(d @ lin, -1)  # (B, H, W)
            total = total + jnp.mean(per_px, axis=(1, 2))
        return total


def _unit_normalize(x, eps=1e-10):
    x = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (norm + eps)


def create_lpips(key: jax.Array, policy: Optional[Policy] = None,
                 image_size: int = 64):
    """Random-init LPIPS (for tests/benches where no checkpoint exists)."""
    policy = policy or default_policy()
    model = LPIPS(policy=policy)
    x = jnp.zeros((1, image_size, image_size, 3), policy.compute_dtype)
    variables = jax.jit(model.init)(key, x, x)
    return model, variables


def convert_torch_lpips(state: dict, backbone: Optional[dict] = None) -> dict:
    """Official torch LPIPS layouts -> this module's variables.

    ``state`` may be:
      - a full ``lpips.LPIPS`` state dict — backbone convs under
        ``net.slice{1..5}.{idx}.weight`` and heads under
        ``lin{k}.model.{-1}.weight`` (1, C, 1, 1);
      - the pip package's lin-only checkpoint (``lin*`` keys only), with
        ``backbone`` a torchvision ``vgg16().features`` state dict
        (``{idx}.weight`` / ``{idx}.bias``).
    """
    conv_names = [n for n, _ in _VGG_PLAN if n != "M"]
    params = {}

    def _put_conv(name, w, b):
        # the shared torch OIHW -> flax HWIO layout definition
        from tpufusion.io.checkpoint import torch_conv_kernel

        params[name] = dict(kernel=jnp.asarray(torch_conv_kernel(w)),
                            bias=jnp.asarray(np.asarray(b)))

    net_keys = sorted(
        (k for k in state if k.startswith("net.") and k.endswith(".weight")),
        key=lambda k: (int(k.split(".")[1].replace("slice", "")),
                       int(k.split(".")[2])))
    if net_keys:
        if len(net_keys) != len(conv_names):
            raise ValueError(
                f"expected {len(conv_names)} backbone convs, found "
                f"{len(net_keys)} ({net_keys[:4]}...)")
        for name, k in zip(conv_names, net_keys):
            _put_conv(name, state[k], state[k[:-len("weight")] + "bias"])
    else:
        if backbone is None:
            raise ValueError(
                "lin-only LPIPS checkpoint needs a torchvision "
                "vgg16().features state dict as `backbone`")
        feat_keys = sorted(
            (k for k in backbone if k.endswith(".weight")),
            key=lambda k: int(k.split(".")[0]))
        if len(feat_keys) < len(conv_names):
            raise ValueError(f"backbone has {len(feat_keys)} convs, need "
                             f"{len(conv_names)}")
        for name, k in zip(conv_names, feat_keys):
            _put_conv(name, backbone[k], backbone[k[:-len("weight")] + "bias"])

    for i, ch in enumerate(TAP_CHANNELS):
        cand = [k for k in state
                if k.startswith(f"lin{i}.") and k.endswith(".weight")]
        if not cand:
            raise ValueError(f"no lin{i} head in LPIPS state dict")
        w = np.asarray(state[sorted(cand)[-1]])  # (1, C, 1, 1)
        if w.shape != (1, ch, 1, 1):
            raise ValueError(f"lin{i}: expected (1, {ch}, 1, 1), got {w.shape}")
        params[f"lin{i}"] = jnp.asarray(w.reshape(ch, 1))
    return {"params": params}


def load_torch_lpips(path: str, backbone_path: Optional[str] = None,
                     policy: Optional[Policy] = None):
    """Load an official LPIPS checkpoint file -> (model, variables)."""
    from tpufusion.io import load_torch_state_dict

    state = load_torch_state_dict(path)
    backbone = (load_torch_state_dict(backbone_path)
                if backbone_path else None)
    policy = policy or default_policy()
    return LPIPS(policy=policy), convert_torch_lpips(state, backbone)
