"""upfirdn2d — upsample / FIR filter / downsample, the StyleGAN2 resampling op.

The reference generator (external ``stylefusion.sf_stylegan2`` used at
`style_fusion_simple.py:10-11`) relies on the rosinality CUDA ``upfirdn2d``
kernel.  Here it is expressed as zero-stuffing + padding + a depthwise XLA
convolution, which Mosaic/XLA fuses and tiles for the TPU VPU; no custom CUDA
is needed and the op stays differentiable for the attack loops.

All tensors are NHWC.  Padding/gain conventions follow the rosinality
arithmetic exactly so that converted ``g_ema`` checkpoints reproduce reference
outputs (SURVEY §7 "hard parts" #1):

- ``upsample_2x``:   pad = ((p+1)//2 + 1, p//2), p = len(k) - 2, gain 4.
- ``downsample_2x``: pad = ((p+1)//2, p//2),     p = len(k) - 2, gain 1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@functools.lru_cache(maxsize=None)
def _kernel_2d(taps: tuple, gain: float) -> np.ndarray:
    k = np.asarray(taps, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k = k / k.sum() * gain
    return k


def make_blur_kernel(taps=(1, 3, 3, 1), gain: float = 1.0) -> jnp.ndarray:
    """Normalised separable FIR kernel as a dense 2D array."""
    return jnp.asarray(_kernel_2d(tuple(taps), float(gain)))


def upfirdn2d(
    x: jax.Array,
    kernel: jax.Array,
    up: int = 1,
    down: int = 1,
    pad: tuple[int, int] = (0, 0),
) -> jax.Array:
    """NHWC upsample-by-zero-stuffing, FIR filter, downsample.

    Matches the semantics of rosinality's ``upfirdn2d(input, kernel, up,
    down, pad)`` (used throughout the reference generator's Blur/Upsample/
    Downsample modules).
    """
    n, h, w, c = x.shape
    kh, kw = kernel.shape

    if up > 1:
        # zero-stuff via pad+reshape: an `.at[::up, ::up].set` scatter is
        # catastrophically slow on TPU
        y = x[:, :, None, :, None, :]
        y = jnp.pad(y, ((0, 0), (0, 0), (0, up - 1), (0, 0), (0, up - 1), (0, 0)))
        x = y.reshape(n, h * up, w * up, c)
        h, w = h * up, w * up

    pad0, pad1 = pad
    # Negative pads crop; XLA's conv padding accepts negatives directly.
    # Filter in the activation dtype: forcing fp32 here doubled the memory
    # traffic of every blur/upsample in the synthesis path (these run at the
    # largest resolutions); the FIR taps are exactly representable in bf16
    # up to the normalisation, and conv accumulation is fp32 on the MXU.
    filt = kernel[::-1, ::-1].astype(x.dtype)
    filt = jnp.tile(filt[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise

    # precision=None defers to ``jax_default_matmul_precision``: unset runs
    # at the MXU's native bf16-input pass (the perf path); drift checks and
    # golden minting set `highest` and get an fp32-faithful blur.  A
    # hardcoded Precision.DEFAULT here silently broke the latter (0.037
    # max-abs generator drift at 128² under an fp32 policy — r5 finding).
    y = lax.conv_general_dilated(
        x,
        filt,
        window_strides=(down, down),
        padding=((pad0, pad1), (pad0, pad1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=None,
    )
    return y.astype(x.dtype)


def blur(x: jax.Array, kernel: jax.Array, pad: tuple[int, int]) -> jax.Array:
    """Plain FIR blur (rosinality ``Blur``; kernel pre-scaled by caller)."""
    return upfirdn2d(x, kernel, up=1, down=1, pad=pad)


def upsample_2x(x: jax.Array, taps=(1, 3, 3, 1)) -> jax.Array:
    """2x zero-stuffed upsample + smoothing (rosinality ``Upsample``)."""
    k = make_blur_kernel(taps, gain=4.0)
    p = k.shape[0] - 2
    return upfirdn2d(x, k, up=2, down=1, pad=((p + 1) // 2 + 1, p // 2))


def downsample_2x(x: jax.Array, taps=(1, 3, 3, 1)) -> jax.Array:
    """Anti-aliased 2x downsample (rosinality ``Downsample``)."""
    k = make_blur_kernel(taps, gain=1.0)
    p = k.shape[0] - 2
    return upfirdn2d(x, k, up=1, down=2, pad=((p + 1) // 2, p // 2))
