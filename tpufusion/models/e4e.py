"""e4e (encoder4editing) image -> W+ encoder — reference C4.

The reference imports ``encoder.psp.pSp`` / ``encoder.psp_encoders.
Encoder4Editing`` (`code/utils/model_utils.py:4-5`) from the public e4e
codebase: an IR-SE50 backbone with three feature taps feeding 18 progressive
"gradual style" heads; head 0 predicts w_0, heads 1..17 predict deltas added
on top (`model_utils.py:21-35`, `attack_main2.py:137-146` for the
``latent_avg`` offset).

This is a faithful re-implementation of that architecture in NHWC flax so the
``e4e_%s_encode.pt`` checkpoints can be converted weight-for-weight
(``tpufusion.io.checkpoint``), parameterised so tests can run a tiny variant.

Structure (num_layers=50):
  input:  conv3x3(3->64) + BN + PReLU                       @ 256^2
  stage1: 3  x bottleneck-IR-SE(64,  stride 2 first)        -> 128^2
  stage2: 4  x bottleneck-IR-SE(128)  -> tap c1             -> 64^2
  stage3: 14 x bottleneck-IR-SE(256)  -> tap c2             -> 32^2
  stage4: 3  x bottleneck-IR-SE(512)  -> tap c3             -> 16^2
  FPN:    p2 = up(c3) + lat1(c2); p1 = up(p2) + lat2(c1)
  heads:  style[0](c3) -> w0; style[1..2](c3), style[3..6](p2),
          style[7..](p1) -> deltas (progressive, all active at inference)
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpufusion.core.dtypes import Policy, default_policy
from tpufusion.models.stylegan2 import EqualLinear


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm: y = scale*(x-mean)/sqrt(var+eps) + bias.

    The reference encoder always runs ``eval()`` (`model_utils.py:16`), so
    running statistics are plain parameters here (filled by the converter).
    """

    eps: float = 1e-5
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", lambda k, s: jnp.ones(s, self.param_dtype), (c,))
        bias = self.param("bias", lambda k, s: jnp.zeros(s, self.param_dtype), (c,))
        mean = self.param("mean", lambda k, s: jnp.zeros(s, self.param_dtype), (c,))
        var = self.param("var", lambda k, s: jnp.ones(s, self.param_dtype), (c,))
        dt = x.dtype
        inv = (scale * jax.lax.rsqrt(var + self.eps)).astype(dt)
        return x * inv + (bias - mean * scale * jax.lax.rsqrt(var + self.eps)).astype(dt)


class PReLU(nn.Module):
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        a = self.param(
            "alpha", lambda k, s: jnp.full(s, 0.25, self.param_dtype), (x.shape[-1],)
        ).astype(x.dtype)
        return jnp.where(x >= 0, x, a * x)


class SEModule(nn.Module):
    reduction: int = 16
    policy: Policy = dataclasses.field(default_factory=default_policy)

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # (N, C) global pool
        s = s.astype(x.dtype)
        s = nn.Dense(max(c // self.reduction, 1), use_bias=False,
                     dtype=x.dtype, param_dtype=self.policy.param_dtype, name="fc1")(s)
        s = jax.nn.relu(s)
        s = nn.Dense(c, use_bias=False, dtype=x.dtype,
                     param_dtype=self.policy.param_dtype, name="fc2")(s)
        s = jax.nn.sigmoid(s)
        return x * s[:, None, None, :]


class BottleneckIRSE(nn.Module):
    depth: int
    stride: int
    policy: Policy = dataclasses.field(default_factory=default_policy)

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        pd = self.policy.param_dtype
        if cin == self.depth:
            # IR-SE uses MaxPool2d(1, stride) when channels match — i.e. a
            # strided subsample (identity at stride 1); a parameterized
            # shortcut here would make real e4e checkpoints unloadable.
            shortcut = x if self.stride == 1 else x[:, ::self.stride, ::self.stride, :]
        else:
            shortcut = nn.Conv(self.depth, (1, 1), strides=self.stride, use_bias=False,
                               dtype=x.dtype, param_dtype=pd, name="shortcut_conv")(x)
            shortcut = FrozenBatchNorm(param_dtype=pd, name="shortcut_bn")(shortcut)
        y = FrozenBatchNorm(param_dtype=pd, name="bn1")(x)
        y = nn.Conv(self.depth, (3, 3), padding=1, use_bias=False,
                    dtype=x.dtype, param_dtype=pd, name="conv1")(y)
        y = PReLU(param_dtype=pd, name="prelu")(y)
        y = nn.Conv(self.depth, (3, 3), strides=self.stride, padding=1, use_bias=False,
                    dtype=x.dtype, param_dtype=pd, name="conv2")(y)
        y = FrozenBatchNorm(param_dtype=pd, name="bn2")(y)
        y = SEModule(policy=self.policy, name="se")(y)
        return y + shortcut


class GradualStyleBlock(nn.Module):
    """spatial^2 feature map -> one 512-d style via strided convs + linear."""

    out_dim: int
    spatial: int
    policy: Policy = dataclasses.field(default_factory=default_policy)

    @nn.compact
    def __call__(self, x):
        num_pools = int(math.log2(self.spatial))
        pd = self.policy.param_dtype
        for i in range(num_pools):
            x = nn.Conv(self.out_dim, (3, 3), strides=2, padding=1,
                        dtype=x.dtype, param_dtype=pd, name=f"conv{i}")(x)
            x = jax.nn.leaky_relu(x, 0.01)
        x = x.reshape(x.shape[0], -1)
        return EqualLinear(self.out_dim, policy=self.policy, name="linear")(x)


def _interp_matrix(n_in: int, n_out: int) -> jnp.ndarray:
    """Dense 1D bilinear interpolation matrix, torch align_corners=True
    convention: out position o samples input coordinate o*(n_in-1)/(n_out-1)."""
    import numpy as np

    m = np.zeros((n_out, n_in), np.float32)
    if n_in == 1:
        m[:, 0] = 1.0
        return jnp.asarray(m)
    pos = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    i0 = np.clip(np.floor(pos).astype(int), 0, n_in - 2)
    frac = pos - i0
    m[np.arange(n_out), i0] = 1.0 - frac
    m[np.arange(n_out), i0 + 1] = frac
    return jnp.asarray(m)


def _upsample_add(x, y):
    """Bilinear (align_corners=True) upsample of x to y's spatial dims, + y.

    Implemented as two small dense interpolation-matrix contractions
    (einsum over the spatial axes) instead of ``jax.image`` resampling: the
    matrices are static, the op maps straight onto the MXU, and the backward
    pass is just the transposed matmuls — ``scale_and_translate``'s VJP was
    found to be pathologically slow to compile on the TPU toolchain here.
    """
    n, h, w, c = y.shape
    in_h, in_w = x.shape[1], x.shape[2]
    if (in_h, in_w) == (h, w):
        return x + y
    mh = _interp_matrix(in_h, h).astype(jnp.float32)
    mw = _interp_matrix(in_w, w).astype(jnp.float32)
    up = jnp.einsum("oi,nijc->nojc", mh, x.astype(jnp.float32))
    up = jnp.einsum("pj,nojc->nopc", mw, up)
    return up.astype(y.dtype) + y


class _ScanUnit(nn.Module):
    """Scan body: one stride-1 IR-SE block as (carry, None) -> (carry, None)."""

    depth: int
    policy: Policy = dataclasses.field(default_factory=default_policy)

    @nn.compact
    def __call__(self, carry, _):
        return BottleneckIRSE(self.depth, 1, policy=self.policy, name="block")(carry), None


class Encoder4Editing(nn.Module):
    """IR-SE backbone + progressive style heads; returns (N, n_styles, 512).

    Output is the raw encoder prediction; add ``latent_avg`` via
    ``get_latents`` below (mirrors `attack_main2.py:137-146`).

    Compile-scaling design (TPU-specific, found empirically: XLA compile time
    grows superlinearly with conv-chain depth in backward graphs, and this
    deployment's compile service dies on very deep modules):
    - the (n-1) identical stride-1 units of each stage run under ``nn.scan``
      with stacked params — one compiled block body per stage;
    - the style heads run under ``nn.vmap`` in three groups (coarse@c3,
      middle@p2, fine@p1) — one compiled head body per group, and the 18
      small head convs become 3 batched convs (an MXU win as well).
    """

    n_styles: int = 18
    style_dim: int = 512
    base_channels: int = 64  # 64 -> IR-SE50 widths (64,128,256,512)
    unit_counts: Sequence[int] = (3, 4, 14, 3)
    coarse_ind: int = 3
    middle_ind: int = 7
    policy: Policy = dataclasses.field(default_factory=default_policy)

    def head_group_sizes(self):
        """(coarse, middle, fine) head counts; coarse includes head 0."""
        n = self.n_styles
        return (
            min(self.coarse_ind, n),
            max(min(self.middle_ind, n) - self.coarse_ind, 0),
            max(n - self.middle_ind, 0),
        )

    @nn.compact
    def __call__(self, x):
        dt = self.policy.compute_dtype
        pd = self.policy.param_dtype
        b = self.base_channels
        depths = (b, 2 * b, 4 * b, 8 * b)

        y = nn.Conv(b, (3, 3), padding=1, use_bias=False, dtype=dt,
                    param_dtype=pd, name="input_conv")(x.astype(dt))
        y = FrozenBatchNorm(param_dtype=pd, name="input_bn")(y)
        y = PReLU(param_dtype=pd, name="input_prelu")(y)

        taps = []
        for stage, (depth, n_units) in enumerate(zip(depths, self.unit_counts)):
            y = BottleneckIRSE(depth, 2, policy=self.policy,
                               name=f"stage{stage}_unit0")(y)
            if n_units > 1:
                scanned = nn.scan(
                    _ScanUnit,
                    variable_axes={"params": 0},
                    split_rngs={"params": True},
                    length=n_units - 1,
                )(depth, policy=self.policy, name=f"stage{stage}_rest")
                y, _ = scanned(y, None)
            if stage >= 1:
                taps.append(y)
        c1, c2, c3 = taps  # 2b@64^2, 4b@32^2, 8b@16^2 (for 256^2 input)

        lat1 = nn.Conv(self.style_dim, (1, 1), dtype=dt, param_dtype=pd, name="latlayer1")(c2)
        lat2 = nn.Conv(self.style_dim, (1, 1), dtype=dt, param_dtype=pd, name="latlayer2")(c1)
        p2 = _upsample_add(c3 if c3.shape[-1] == self.style_dim else
                           nn.Conv(self.style_dim, (1, 1), dtype=dt, param_dtype=pd,
                                   name="c3_proj")(c3), lat1)
        p1 = _upsample_add(p2, lat2)

        n_coarse, n_middle, n_fine = self.head_group_sizes()
        groups = []
        for name, feat, n_heads in (
            ("heads_coarse", c3, n_coarse),
            ("heads_middle", p2, n_middle),
            ("heads_fine", p1, n_fine),
        ):
            if n_heads == 0:
                continue
            vmapped = nn.vmap(
                GradualStyleBlock,
                in_axes=None,
                out_axes=0,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                axis_size=n_heads,
            )(self.style_dim, feat.shape[1], policy=self.policy, name=name)
            groups.append(vmapped(feat))  # (n_heads, N, style_dim)
        w = jnp.concatenate(groups, axis=0).transpose(1, 0, 2).astype(jnp.float32)
        # progressive: w_i = w_0 + delta_i  (inference = all stages active)
        w = w.at[:, 1:].add(w[:, :1])
        return w


def get_latents(encoder, variables, x, latent_avg, is_cars: bool = False):
    """Encoder forward + latent_avg offset + cars 18->16 trim
    (`attack_main2.py:137-146`)."""
    codes = encoder.apply(variables, x)
    codes = codes + latent_avg[None].astype(codes.dtype)
    if is_cars and codes.shape[1] == 18:
        codes = codes[:, :16]
    return codes


def create_encoder(
    key: jax.Array,
    n_styles: int = 18,
    *,
    image_size: int = 256,
    base_channels: int = 64,
    unit_counts: Sequence[int] = (3, 4, 14, 3),
    policy: Optional[Policy] = None,
):
    policy = policy or default_policy()
    enc = Encoder4Editing(
        n_styles=n_styles,
        base_channels=base_channels,
        unit_counts=tuple(unit_counts),
        policy=policy,
    )
    variables = jax.jit(enc.init)(key, jnp.zeros((1, image_size, image_size, 3), policy.compute_dtype))
    return enc, variables
