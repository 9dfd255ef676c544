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

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax import lax

from tpufusion.ops.upfirdn2d import blur, make_blur_kernel


# ---------------------------------------------------------------------------
# Space-to-depth packing for the low-channel synthesis tail.
#
# A 3x3 SAME conv at (H, W, C) is numerically identical to a 3x3 SAME conv
# at (H/2, W/2, 4C) on the space-to-depth packing of the input, with a
# sparse-transformed kernel (each output phase (py,px) gathers the 9 taps
# it needs from the (block-offset, input-phase) grid; 36 of the 144
# phase-pair blocks are nonzero).  The packed conv trades 4x nominal FLOPs
# for full 128-lane MXU occupancy.
#
# MEASURED (v5e, 1024^2 C=32, docs/DESIGN.md §9): the bare conv wins 2.1x
# in isolation (15.8 -> 7.6 ms, 9.8 -> 81.7 effective TFLOP/s) — but
# END-TO-END the whitebox step LOSES: 155 -> 171 ms fully packed (the
# s2d/d2s transposes add ~10 GB of backward traffic) and 155 -> 165 ms
# even with a custom-VJP direct backward (the repack passes + broken
# epilogue fusion outweigh the conv saving; the program is
# bandwidth-bound, so a compute-side win cannot pay for extra passes over
# 0.5 GB activations).  Default therefore OFF; the path stays available
# via TPUFUSION_S2D_TAIL=1 for forward-dominated experiments.
# ---------------------------------------------------------------------------

S2D_MIN_RES = 1024


def _s2d(x: jax.Array) -> jax.Array:
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def _d2s(y: jax.Array, c: int) -> jax.Array:
    n, h2, w2, _ = y.shape
    y = y.reshape(n, h2, w2, 2, 2, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, h2 * 2, w2 * 2, c)


@functools.lru_cache(maxsize=None)
def _s2d_weight_plan(cin: int, cout: int):
    """Nonzero-block index plan for the packed 3x3 kernel: entries
    (A, B, dy, dx, py, px, ky, kx) with ky = 2A+dy-py-1, kx = 2B+dx-px-1
    in range."""
    plan = []
    for A in range(3):
        for B in range(3):
            for dy in range(2):
                for dx in range(2):
                    for py in range(2):
                        for px in range(2):
                            ky = 2 * A + dy - py - 1
                            kx = 2 * B + dx - px - 1
                            if 0 <= ky < 3 and 0 <= kx < 3:
                                plan.append((A, B, dy, dx, py, px, ky, kx))
    return tuple(plan)


def s2d_transform_weights(w: jax.Array) -> jax.Array:
    """(3, 3, Cin, Cout) -> (3, 3, 4*Cin, 4*Cout) packed-space kernel.

    Built by scatter of the 36 nonzero (phase-in, phase-out) blocks; traced
    once per shape (the scatter is on weights, negligible next to the conv).
    """
    _, _, cin, cout = w.shape
    wp = jnp.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for A, B, dy, dx, py, px, ky, kx in _s2d_weight_plan(cin, cout):
        ci0 = (dy * 2 + dx) * cin
        co0 = (py * 2 + px) * cout
        wp = wp.at[A, B, ci0:ci0 + cin, co0:co0 + cout].set(w[ky, kx])
    return wp


def _conv3x3_direct(xs: jax.Array, w: jax.Array) -> jax.Array:
    return lax.conv_general_dilated(
        xs, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@jax.custom_vjp
def conv3x3_s2d(xs: jax.Array, w: jax.Array) -> jax.Array:
    """3x3 SAME conv: space-to-depth packed FORWARD, direct-composite
    BACKWARD.

    The packed conv wins 2.1x on the forward at 1024^2 C=32, but
    differentiating *through* the s2d/d2s transposes adds ~4 extra full
    passes over the activation buffer (measured: whitebox step 155 -> 171 ms
    with a fully-packed grad).  The custom VJP keeps the forward win and
    hands the backward to XLA's autodiff of the direct conv — numerically
    identical, no extra residuals (xs and w are live either way).
    """
    cout = w.shape[3]
    wp = s2d_transform_weights(w)
    y = lax.conv_general_dilated(
        _s2d(xs), wp, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return _d2s(y, cout)


def _c3s2d_fwd(xs, w):
    return conv3x3_s2d(xs, w), (xs, w)


def _c3s2d_bwd(res, g):
    xs, w = res
    _, vjp = jax.vjp(_conv3x3_direct, xs, w)
    return vjp(g)


conv3x3_s2d.defvjp(_c3s2d_fwd, _c3s2d_bwd)


# Read once at import: _use_s2d runs at TRACE time inside jitted programs,
# so mutating the env var mid-process would silently keep whichever path a
# shape was first traced with (ADVICE r3).  Set TPUFUSION_S2D_TAIL before
# importing tpufusion, or call set_s2d_tail() (clears jit caches).
_S2D_TAIL_ENABLED = os.environ.get(
    "TPUFUSION_S2D_TAIL", "0").lower() in ("1", "on", "true")

# Width-packed Pallas tail convs (ops/pallas_conv.py): repack in VMEM
# instead of HBM — the fix for exactly the transpose cost that sank the
# s2d path.  Same read-once discipline as the s2d flag.
_WP_TAIL_ENABLED = os.environ.get(
    "TPUFUSION_WP_TAIL", "0").lower() in ("1", "on", "true")
# Channel subset for the wp path: isolated wp wins at C=32 (1.27x fwd /
# 1.32x grad at 1024^2) but LOSES at C=64 (0.86x/0.93x at 512^2, where the
# 2x spill tax buys only 2x occupancy against an already-decent XLA conv) —
# measured r5, benchmarks/wp_conv_bench.py.
_WP_CHANNELS = frozenset(
    int(t) for t in os.environ.get(
        "TPUFUSION_WP_CHANNELS", "32").split(",") if t.strip())


def set_wp_tail(enabled: bool, channels=None) -> None:
    """Toggle the width-packed Pallas tail-conv path for NEW traces."""
    global _WP_TAIL_ENABLED, _WP_CHANNELS
    _WP_TAIL_ENABLED = bool(enabled)
    if channels is not None:
        _WP_CHANNELS = frozenset(channels)
    jax.clear_caches()


def _use_wp(x_shape, w_shape, dtype=None) -> bool:
    if not _WP_TAIL_ENABLED or x_shape[-1] not in _WP_CHANNELS:
        return False
    from tpufusion.ops.pallas_conv import _supported

    return _supported(x_shape, w_shape, dtype)


def set_s2d_tail(enabled: bool) -> None:
    """Toggle the space-to-depth tail-conv path for NEW traces.

    Clears jax's jit caches so already-traced shapes re-trace with the new
    setting (the persistent compile cache keys on the emitted HLO, which
    differs between the two paths, so it stays coherent)."""
    global _S2D_TAIL_ENABLED
    _S2D_TAIL_ENABLED = bool(enabled)
    jax.clear_caches()


def _use_s2d(h: int, w: int, kh: int, cin: int) -> bool:
    # explicit opt-in only (measured default OFF: see module comment) —
    # anything else, incl. 'false'/'OFF'/typos, keeps the default path
    if not _S2D_TAIL_ENABLED:
        return False
    return (kh == 3 and cin <= 32 and min(h, w) >= S2D_MIN_RES
            and h % 2 == 0 and w % 2 == 0)


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
    elif _use_wp(xs.shape, w.shape, xs.dtype):
        # low-channel tail: width-packed Pallas conv — full MXU lanes,
        # repack entirely in VMEM (zero extra HBM passes)
        from tpufusion.ops.pallas_conv import conv3x3_wp

        y = conv3x3_wp(xs, w)
    elif _use_s2d(x.shape[1], x.shape[2], kh, cin):
        # low-channel high-res tail: packed-space conv fills the MXU lanes
        y = conv3x3_s2d(xs, w)
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
