"""Modulated convolution — the StyleGAN2 workhorse, TPU-shaped.

The reference generator's ``ModulatedConv2d`` (external rosinality code used
by `style_fusion_simple.py:10-11`) builds per-sample weights
``w * style`` and runs a grouped conv — fine on CUDA, hostile to the TPU MXU
(grouped convs with batch-many groups defeat MXU tiling).  Here we use the
mathematically identical "input scaling" form:

    y[n] = conv(x[n] * s[n], W) * sigma[n]          (demodulation)
    sigma[n, j] = rsqrt( sum_{i,kh,kw} (W[kh,kw,i,j] * s[n,i])^2 + 1e-8 )

which keeps one shared weight in the conv (a single large MXU-friendly
contraction for the whole batch) and turns modulation/demodulation into cheap
VPU elementwise scalings that XLA fuses into the conv's prologue/epilogue.

Upsample path: transposed conv (lhs-dilated conv in XLA) followed by the
rosinality blur with pad ((p+1)//2 + 1, p//2 + 1), p = len(k) - 2 - (ksize-1),
kernel gain 4.  Demodulation commutes with the depthwise blur (per-output-
channel scalar), so it is still applied as an output scaling.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

from tpufusion.ops.upfirdn2d import blur, make_blur_kernel


def modulated_conv2d(
    x: jax.Array,
    weight: jax.Array,
    style: jax.Array,
    *,
    demodulate: bool = True,
    up: bool = False,
    down: bool = False,
    blur_taps=(1, 3, 3, 1),
    accum_dtype=jnp.float32,
) -> jax.Array:
    """Apply a style-modulated conv.

    Args:
      x:      (N, H, W, Cin) activations.
      weight: (kh, kw, Cin, Cout) unscaled weight; equalized-lr scale
              ``1/sqrt(Cin*kh*kw)`` is applied here (rosinality convention).
      style:  (N, Cin) modulation — the *post-affine* style vector ``s``,
              i.e. exactly the per-layer entries of the reference's
              ``style_vector`` API (`style_fusion_simple.py:115-129`).
    """
    kh, kw, cin, cout = weight.shape
    scale = 1.0 / math.sqrt(cin * kh * kw)
    w = (weight * scale).astype(x.dtype)
    s = style.astype(x.dtype)

    xs = x * s[:, None, None, :]

    if up:
        # Transposed conv == correlation of the 2x lhs-dilated input with the
        # spatially-flipped kernel under full (k-1) padding.  (A subpixel
        # 2x2-conv + depth-to-space decomposition microbenched 1.6x faster in
        # isolation but measured SLOWER end-to-end — the depth-to-space
        # transpose defeats XLA's fusion of the following blur.)
        y = lax.conv_general_dilated(
            xs,
            w[::-1, ::-1],
            window_strides=(1, 1),
            padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        k = make_blur_kernel(blur_taps, gain=4.0)
        p = (len(blur_taps) - 2) - (kh - 1)
        y = blur(y, k, pad=((p + 1) // 2 + 1, p // 2 + 1))
    elif down:
        k = make_blur_kernel(blur_taps, gain=1.0)
        p = (len(blur_taps) - 2) + (kh - 1)
        xs = blur(xs, k, pad=((p + 1) // 2, p // 2))
        y = lax.conv_general_dilated(
            xs,
            w,
            window_strides=(2, 2),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    else:
        y = lax.conv_general_dilated(
            xs,
            w,
            window_strides=(1, 1),
            padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    if demodulate:
        w32 = (weight.astype(accum_dtype) * scale) ** 2
        w2 = jnp.sum(w32, axis=(0, 1))  # (Cin, Cout)
        s32 = style.astype(accum_dtype)
        sigma = lax.rsqrt((s32**2) @ w2 + 1e-8)  # (N, Cout)
        y = y * sigma[:, None, None, :].astype(y.dtype)

    return y
