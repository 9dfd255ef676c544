"""Fused StyledConv Pallas kernel — modulate + 3x3 conv + demodulate + noise
+ bias + leaky-ReLU(sqrt 2) in ONE VMEM pass.

This is the BASELINE.json north-star experiment ("fused Pallas
modconv+bias+act kernels"): the StyleGAN2 synthesis stack's non-upsampling
styled conv (`models/stylegan2.py::_styled_conv`, up=False) as a hand-written
TPU kernel, measured against XLA's fusion of the same composite
(`ops/modconv.py`).  Whichever wins stays the default; see
benchmarks/modconv_bench.py + docs/DESIGN.md §3 for the measurements.

Kernel shape:
- grid (N, H/TH): one batch sample x one row-tile per program;
- the 3x3 conv becomes 9 shifted (TH*W, Cin) @ (Cin, Cout) MXU matmuls over a
  1-pixel-padded input;
- the row halo is fetched as a SECOND blocked input spec (2 rows at element
  offset (r+1)*TH, expressed as block index (r+1)*TH//2 of a 2-row block) so
  the standard Pallas pipeline double-buffers both streams — no manual DMA;
- modulation (x * style), demodulation (y * sigma), noise add, bias and the
  leaky-ReLU * sqrt(2) epilogue all happen on the block while it is resident
  in VMEM;
- backward falls back to XLA autodiff of the numerically-identical composite
  (custom_vjp), so attacks differentiate through it unchanged.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

from tpufusion.ops.modconv import modulated_conv2d

SQRT2 = math.sqrt(2.0)


def noise_bias_act(y, noise, noise_strength, bias):
    """The styled-conv epilogue: noise injection + bias + leaky-ReLU·√2.

    Single definition shared by the XLA composite below AND the generator's
    general (upsampling / randomized-noise) path so the semantics cannot
    diverge between them (rosinality ``StyledConv.forward``: NoiseInjection
    then FusedLeakyReLU)."""
    y = y + noise_strength.astype(y.dtype) * noise.astype(y.dtype)
    return jax.nn.leaky_relu(y + bias.astype(y.dtype), 0.2) * SQRT2


def _xla_styled_conv(x, weight, style, noise, noise_strength, bias):
    """The reference composite (what XLA fuses; also the VJP path)."""
    y = modulated_conv2d(x, weight, style, demodulate=True, up=False)
    return noise_bias_act(y, noise, noise_strength, bias)


def _kernel(xm_ref, xh_ref, w_ref, s_ref, sig_ref, b_ref, nz_ref, out_ref):
    th, wpad = xm_ref.shape[1], xm_ref.shape[2]
    w_out = wpad - 2
    cout = w_ref.shape[3]

    # stitch main rows + 2 halo rows, then modulate by this sample's style
    # (style/sigma arrive as per-sample blocks — dynamic row loads are not
    # provably sublane-aligned for Mosaic)
    x = jnp.concatenate([xm_ref[0], xh_ref[0]], axis=0)  # (TH+2, W+2, Cin)
    s = s_ref[0, 0, :].astype(x.dtype)
    xs = x * s[None, None, :]

    # 3x3 conv as 9 shifted matmuls accumulated in fp32 on the MXU
    acc = jnp.zeros((th, w_out, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = xs[dy : dy + th, dx : dx + w_out, :]
            acc = acc + jax.lax.dot_general(
                patch, w_ref[dy, dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    # demod + bias epilogue, then noise + leaky-ReLU*sqrt(2)
    y = acc * sig_ref[0, 0, :][None, None, :] + b_ref[0, :][None, None, :]
    y = y + nz_ref[:, :][:, :, None]
    y = jnp.where(y >= 0, y, 0.2 * y) * SQRT2
    out_ref[0] = y.astype(out_ref.dtype)


def _row_tile(h: int, w: int, cin: int, itemsize: int) -> int:
    """Largest even power-of-two row tile whose padded block fits ~2MB.

    The scoped-VMEM budget (16 MB) must hold: 2x double-buffered input
    blocks, 2x output blocks, the fp32 accumulator (th*w*cout*4), the
    modulated copy, and the weights — a 2 MB x-block keeps the total under
    the limit at every config-f resolution (4 MB OOMed at 256^2/128ch)."""
    budget = 2 * 1024 * 1024
    cin_padded = max(cin, 128)  # lanes pad to 128: a 32-ch block costs 4x
    th = h
    while th > 8 and (th + 2) * (w + 2) * cin_padded * itemsize > budget:
        th //= 2
    # two structural requirements the budget loop can break when h is even
    # but not a power of two: th must divide h (grid = h // th drops rows
    # otherwise) and th must be even (the halo BlockSpec indexes 2-row
    # blocks at (r+1)*th//2 — an odd th misaligns the halo by one row and
    # silently corrupts the conv).  h even guarantees th=2 terminates.
    th = max(th, 2)
    while th % 2 or h % th:
        th -= 1
    return th


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_styled_conv(x, weight, style, noise, noise_strength, bias,
                        *, interpret: bool = False):
    n, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    assert (kh, kw) == (3, 3), "fused kernel targets the 3x3 styled conv"

    scale = 1.0 / math.sqrt(cin * kh * kw)
    w_s = (weight * scale).astype(x.dtype)

    # demod sigma in fp32 (identical math to ops.modconv)
    w2 = jnp.sum((weight.astype(jnp.float32) * scale) ** 2, axis=(0, 1))
    sigma = jax.lax.rsqrt((style.astype(jnp.float32) ** 2) @ w2 + 1e-8)  # (N, Cout)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    th = _row_tile(h, w, cin, x.dtype.itemsize)
    grid = (n, h // th)

    noise2d = (noise_strength.astype(jnp.float32)
               * noise.reshape(noise.shape[-3], noise.shape[-2]).astype(jnp.float32))

    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            # main rows [r*TH, r*TH+TH)
            pl.BlockSpec((1, th, w + 2, cin), lambda i, r: (i, r, 0, 0),
                         memory_space=pltpu.VMEM),
            # halo rows [(r+1)*TH, (r+1)*TH+2) as block index of a 2-row block
            pl.BlockSpec((1, 2, w + 2, cin),
                         lambda i, r: (i, (r + 1) * th // 2, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weight (3,3,Cin,Cout)
            pl.BlockSpec((1, 1, cin), lambda i, r: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # style row for sample i
            pl.BlockSpec((1, 1, cout), lambda i, r: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # sigma row for sample i
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias (1,Cout)
            pl.BlockSpec((th, w), lambda i, r: (r, 0),
                         memory_space=pltpu.VMEM),  # scaled noise (H,W)
        ],
        out_specs=pl.BlockSpec((1, th, w, cout), lambda i, r: (i, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), x.dtype),
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            if not interpret else None
        ),
        interpret=interpret,
    )(
        xp, xp, w_s, style.astype(x.dtype)[:, None, :], sigma[:, None, :],
        bias.reshape(1, -1).astype(jnp.float32), noise2d,
    )
    return out


@jax.custom_vjp
def fused_styled_conv(x, weight, style, noise, noise_strength, bias):
    """Pallas-fused styled conv (forward); XLA-composite gradient."""
    return _pallas_styled_conv(x, weight, style, noise, noise_strength, bias)


def _fsc_fwd(x, weight, style, noise, noise_strength, bias):
    out = _pallas_styled_conv(x, weight, style, noise, noise_strength, bias)
    return out, (x, weight, style, noise, noise_strength, bias)


def _fsc_bwd(res, g):
    # differentiate the numerically-identical XLA composite
    _, vjp = jax.vjp(_xla_styled_conv, *res)
    return vjp(g)


fused_styled_conv.defvjp(_fsc_fwd, _fsc_bwd)


def styled_conv_reference(x, weight, style, noise, noise_strength, bias):
    """Public alias of the XLA composite (benchmark baseline)."""
    return _xla_styled_conv(x, weight, style, noise, noise_strength, bias)


def pallas_styled_conv_mode() -> str:
    """Dispatch mode, from the v5e measurement (benchmarks/modconv_bench.py,
    docs/DESIGN.md §3).  Measured per-layer (batch-8 bf16): the kernel wins
    only where the channel count exactly fills the 128-lane MXU width
    without oversized blocks (res 256/cin 128: 0.90x, res 128/cin 256:
    0.98x) and loses elsewhere (up to 2.6x at 32^2, 1.46x at 1024^2 where
    32-channel lane padding quadruples every buffer).  END-TO-END the
    window is a wash (62.1 vs 60.0 ms full 1024^2 synthesis): the Pallas
    call boundary breaks XLA's fusion of the surrounding upsample/blur/
    ToRGB, costing more than the ~0.4 ms the two layers save.  Default is
    therefore the XLA composite ('off'); the kernel stays available for
    experiments.

    TPUFUSION_PALLAS_MODCONV: unset/'0'/'off' -> never (measured default);
    'window'/'auto' -> the microbench win window (cin 128-256);
    '1'/'all' -> everywhere.
    """
    if not (_HAS_PALLAS and jax.default_backend() in ("tpu", "axon")):
        return "off"
    v = os.environ.get("TPUFUSION_PALLAS_MODCONV", "off").lower()
    if v in ("1", "all"):
        return "all"
    if v in ("window", "auto"):
        return "window"
    return "off"


def styled_conv(x, weight, style, noise, noise_strength, bias,
                *, use_pallas: bool | None = None):
    """Dispatch between the Pallas kernel and the XLA composite.

    Structural requirements for the kernel: 3x3 weight, even H/W, H >= 16,
    and a SHARED noise buffer (leading dim 1 — the kernel tiles one (H, W)
    noise plane across the batch; per-sample (N, H, W, 1) noise is only
    handled by the XLA composite's broadcasting, so batched noise falls
    back even under ``use_pallas=True``).
    With ``use_pallas=None`` the measured default applies — the XLA
    composite, see ``pallas_styled_conv_mode``; an explicit True forces
    the kernel wherever it is structurally possible.
    """
    h, w, cin = x.shape[1], x.shape[2], x.shape[3]
    # shared = ONE (1, H, W, 1) noise plane tiled across the batch; the
    # kernel indexes noise.shape[-3:-1], so only 4-D layouts qualify (a
    # bare (H, W) noise is not broadcastable against NHWC in the composite
    # either — reject it structurally instead of crashing mid-kernel)
    shared_noise = noise.ndim == 4 and noise.shape[0] == 1
    structural = (weight.shape[0] == 3 and h >= 16
                  and h % 2 == 0 and w % 2 == 0 and shared_noise)
    if use_pallas is None:
        mode = pallas_styled_conv_mode()
        use_pallas = mode == "all" or (mode == "window" and 128 <= cin <= 256)
    if not (use_pallas and structural):
        return _xla_styled_conv(x, weight, style, noise, noise_strength, bias)
    return fused_styled_conv(x, weight, style, noise, noise_strength, bias)
