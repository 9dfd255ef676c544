"""Width-packed 3x3 conv Pallas kernels for the low-channel synthesis tail.

The StyleGAN2 tail convs (3x3 SAME, C=32 @1024^2, C=64 @512^2 — the hottest
kernels of the whitebox/fusion-attack steps, docs/DESIGN.md §9) run far under
MXU capacity under XLA: with C output channels only C of the MXU's 128 lanes
carry data (measured 9.7 TF/s at C=32).  The space-to-depth fix
(`ops/modconv.py::conv3x3_s2d`) repacks in HBM and loses end-to-end because
the repack transposes are extra full passes over the activations.

These kernels repack **in VMEM** instead, with zero extra HBM traffic:

- NHWC activations reshape (N, H, W, C) -> (N, H, W/p, 128) with p = 128/C.
  The minor dims merge contiguously, so the reshape is a free bitcast — the
  kernel reads and writes the SAME bytes XLA's layout already has.
- One output "lane tile" holds p adjacent pixels x C channels.  The 3x3
  conv becomes, per kernel row ky, THREE full K=128 MXU dots: the body lane
  tile, plus the previous/next lane tile (whole-tile sublane shifts), each
  against a host-packed 128x128 weight matrix that zero-pads the C spill
  channels into place (`pack_weights`).  No lane-dimension slicing happens
  on device — lane slices produce offset vector layouts Mosaic cannot
  concatenate (measured r5: `tpu.concatenate ... offset mismatch on
  non-concat dimension`).  FLOP tax 9*128/(9*C) = 4.0x at C=32, 2.0x at
  C=64 — paid at ~full MXU occupancy instead of the C/128 lane fill XLA
  achieves (measured 9.7 TF/s at C=32).
- Row halos (1 row each side) arrive via two 64KB async DMAs from an ANY-
  space alias of the input; the body streams through the normal pipelined
  BlockSpec.  Row-edge halos inside a tile are axis-0 concats in VMEM
  (untiled dim — layout-safe).

Forward, input-grad (same kernel, flipped/transposed weights) and
weight-grad kernels compose into `conv3x3_wp` (a `jax.custom_vjp`), used by
`ops/modconv.py::modulated_conv2d` when `TPUFUSION_WP_TAIL` enables it.

Reference anchor: the convs these accelerate implement rosinality
ModulatedConv2d's 3x3 path (used via `style_fusion_simple.py:10-11`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _supported(x_shape, w_shape, dtype=None) -> bool:
    """Shapes (and optionally dtype) the compiled kernels are sized for.

    The VMEM budget (scratch + packed operand + accumulator + double-
    buffered blocks, see ``_tile_rows``) assumes <=2-byte activations and
    packed width WP <= 256 — f32 at the headline shapes roughly doubles
    live VMEM and can fail at compile instead of falling back, so the
    dispatcher must not route such cases here.  In interpret mode (tests)
    there is no VMEM, so the dtype gate is waived."""
    n, h, w, c = x_shape
    kh, kw, cin, cout = w_shape
    if (kh, kw) != (3, 3) or cin != c or cout != c:
        return False
    if c not in (32, 64) or (w * c) % LANES:
        return False
    p = LANES // c
    if w // p > 256:  # beyond the VMEM sizing of _tile_rows
        return False
    if (dtype is not None and not _INTERPRET
            and jnp.dtype(dtype).itemsize > 2):
        return False
    return w % p == 0 and h % 8 == 0


@functools.lru_cache(maxsize=None)
def _tile_rows(h: int, wp: int) -> int:
    """Largest row-tile <=32 dividing h with th*wp <= 4096.

    The scoped-VMEM stack holds the double-buffered body/out blocks, the
    f32 accumulator, the row-halo concat and the two sublane-shift
    transients — th*wp = 8192 (th=32 at wp=256) allocated 18.1MB against
    the 16MB v5e limit (measured r5, AOT compile failure); th*wp = 4096
    stays ~10MB."""
    for th in (32, 16, 8):
        if h % th == 0 and th * wp <= 4096:
            return th
    return 1


def pack_weights(w: jax.Array) -> jax.Array:
    """(3, 3, C, C) -> (3, 3, 128, 128) width-packed weight stack.

    Dims: (ky, j, k_in, n_out) with j in {0: previous lane tile, 1: body,
    2: next lane tile}.  Body entry wk[ky, 1, C*pi+ci, C*px+co] =
    W[ky, pi-px+1, ci, co] for in-tile pixel pairs |pi-px| <= 1; the prev
    tile's LAST pixel feeds output pixel 0 with kx=0, the next tile's
    FIRST pixel feeds output pixel p-1 with kx=2 — zero-padded into full
    128x128 mats so the kernel never lane-slices on device.
    """
    kh, kw, c, cout = w.shape
    assert (kh, kw) == (3, 3) and c == cout, "width-pack needs 3x3, Cin==Cout"
    p = LANES // c
    wk = jnp.zeros((3, 3, LANES, LANES), w.dtype)
    for pi in range(p):
        for px in range(p):
            kx = pi - px + 1
            if 0 <= kx <= 2:
                wk = wk.at[:, 1, c * pi:c * (pi + 1),
                           c * px:c * (px + 1)].set(w[:, kx])
    wk = wk.at[:, 0, LANES - c:, :c].set(w[:, 0])
    wk = wk.at[:, 2, :c, LANES - c:].set(w[:, 2])
    return wk


def _shifted_cols(xs):
    """Whole-lane-tile sublane shifts: (prev, next) neighbours of each lane
    tile, zero at the row edges (SAME padding).  THE layout invariant of
    this file — forward/input-grad dots and the weight-grad dot must shift
    identically (pack_weights / unpack_dw index math is the adjoint).
    Full-128-lane operands only: lane slices would produce offset layouts
    Mosaic cannot concatenate."""
    z = jnp.zeros(xs[:, :1, :].shape, xs.dtype)
    prev = jnp.concatenate([z, xs[:, :-1, :]], axis=1)
    nxt = jnp.concatenate([xs[:, 1:, :], z], axis=1)
    return prev, nxt


def _row_dot(xs, wk_ky, *, th, wp, c, acc):
    """One kernel-row contribution: three K=128 dots (body + both tile
    spills) against the (3, 128, 128) packed weight row."""
    del c
    m = th * wp
    prev, nxt = _shifted_cols(xs)
    acc = acc + jnp.dot(xs.reshape(m, LANES), wk_ky[1],
                        preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(prev.reshape(m, LANES), wk_ky[0],
                        preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(nxt.reshape(m, LANES), wk_ky[2],
                        preferred_element_type=jnp.float32)
    return acc


def _fwd_kernel(x_ref, x_any, wk_ref, o_ref, halo, sem, *, th, wp, c):
    """One (batch n, row-tile i) program: 3 dots/ky into an f32 accumulator.

    The two halo-row DMAs are started first and waited only after the
    middle kernel row (which needs no halo) has been computed — the body
    block itself arrives through the pipelined BlockSpec."""
    n = pl.program_id(0)
    i = pl.program_id(1)
    rows = pl.num_programs(1)

    # halo rows: row i*th-1 (top) and i*th+th (bottom), zero at the edges
    halo[:] = jnp.zeros(halo.shape, halo.dtype)
    top = pltpu.make_async_copy(
        x_any.at[n, pl.ds(jnp.maximum(i * th - 1, 0), 1)], halo.at[0],
        sem.at[0])
    bot = pltpu.make_async_copy(
        x_any.at[n, pl.ds(jnp.minimum(i * th + th, rows * th - 1), 1)],
        halo.at[1], sem.at[1])

    @pl.when(i > 0)
    def _():
        top.start()

    @pl.when(i < rows - 1)
    def _():
        bot.start()

    body = x_ref[0]                                   # (th, wp, 128)
    # ky=1 (middle row) reads only the body — compute it while DMAs fly
    acc = jnp.zeros((th * wp, LANES), jnp.float32)
    acc = _row_dot(body, wk_ref[1], th=th, wp=wp, c=c, acc=acc)

    @pl.when(i > 0)
    def _():
        top.wait()

    @pl.when(i < rows - 1)
    def _():
        bot.wait()

    xh = jnp.concatenate([halo[0], body, halo[1]], axis=0)  # (th+2, wp, 128)
    acc = _row_dot(xh[:th], wk_ref[0], th=th, wp=wp, c=c, acc=acc)
    acc = _row_dot(xh[2:], wk_ref[2], th=th, wp=wp, c=c, acc=acc)
    o_ref[0] = acc.reshape(th, wp, LANES).astype(o_ref.dtype)


def _conv3x3_wp_fwd_impl(x: jax.Array, wk: jax.Array) -> jax.Array:
    n, h, w, c = x.shape
    p = LANES // c
    wp = w // p
    th = _tile_rows(h, wp)
    xp = x.reshape(n, h, wp, LANES)
    kern = functools.partial(_fwd_kernel, th=th, wp=wp, c=c)
    yp = pl.pallas_call(
        kern,
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec((1, th, wp, LANES), lambda nn, ii: (nn, ii, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, 3, LANES, LANES),
                         lambda nn, ii: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, wp, LANES),
                               lambda nn, ii: (nn, ii, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, wp, LANES), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 1, wp, LANES), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * n * h * wp * LANES * LANES,
            bytes_accessed=2 * (2 * n * h * wp * LANES) + wk.size * 2,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(xp, xp, wk)
    return yp.reshape(n, h, w, c)


def _dw_kernel(x_ref, g_ref, x_any, dw_ref, halo, sem, *, th, wp, c):
    """Accumulate the packed weight-grad: dWk[ky] += Pk(ky)^T @ G."""
    n = pl.program_id(0)
    i = pl.program_id(1)
    rows = pl.num_programs(1)

    @pl.when(jnp.logical_and(n == 0, i == 0))
    def _():
        dw_ref[:] = jnp.zeros(dw_ref.shape, dw_ref.dtype)

    halo[:] = jnp.zeros(halo.shape, halo.dtype)
    top = pltpu.make_async_copy(
        x_any.at[n, pl.ds(jnp.maximum(i * th - 1, 0), 1)], halo.at[0],
        sem.at[0])
    bot = pltpu.make_async_copy(
        x_any.at[n, pl.ds(jnp.minimum(i * th + th, rows * th - 1), 1)],
        halo.at[1], sem.at[1])

    @pl.when(i > 0)
    def _():
        top.start()

    @pl.when(i < rows - 1)
    def _():
        bot.start()

    body = x_ref[0]
    g2 = g_ref[0].reshape(th * wp, LANES)

    def ky_dot(xs, ky):
        m = th * wp
        prev, nxt = _shifted_cols(xs)
        for j, op in ((0, prev), (1, xs), (2, nxt)):
            dw_ref[ky, j] += jax.lax.dot_general(
                op.reshape(m, LANES), g2,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    ky_dot(body, 1)  # middle row needs no halo — overlaps the DMAs

    @pl.when(i > 0)
    def _():
        top.wait()

    @pl.when(i < rows - 1)
    def _():
        bot.wait()

    xh = jnp.concatenate([halo[0], body, halo[1]], axis=0)
    ky_dot(xh[:th], 0)
    ky_dot(xh[2:], 2)


def _conv3x3_wp_dw_impl(x: jax.Array, g: jax.Array, c: int) -> jax.Array:
    """Packed weight grad (3, 3, 128, 128) f32; unpack via unpack_dw."""
    n, h, w, _ = x.shape
    p = LANES // c
    wp = w // p
    th = _tile_rows(h, wp)
    xp = x.reshape(n, h, wp, LANES)
    gp = g.reshape(n, h, wp, LANES)
    kern = functools.partial(_dw_kernel, th=th, wp=wp, c=c)
    return pl.pallas_call(
        kern,
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec((1, th, wp, LANES), lambda nn, ii: (nn, ii, 0, 0)),
            pl.BlockSpec((1, th, wp, LANES), lambda nn, ii: (nn, ii, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((3, 3, LANES, LANES),
                               lambda nn, ii: (0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((3, 3, LANES, LANES),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 1, wp, LANES), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * n * h * wp * LANES * LANES,
            bytes_accessed=2 * (2 * n * h * wp * LANES),
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(xp, gp, xp)


def unpack_dw(dwk: jax.Array, c: int, dtype) -> jax.Array:
    """(3, 3, 128, 128) packed weight-grad -> (3, 3, C, C).

    The adjoint of pack_weights: sum every packed cell a given
    W[ky, kx, ci, co] was scattered to (body pixel pairs pi-px+1 = kx,
    plus the prev/next tile spill blocks).
    """
    p = LANES // c
    dw = jnp.zeros((3, 3, c, c), jnp.float32)
    for pi in range(p):
        for px in range(p):
            kx = pi - px + 1
            if 0 <= kx <= 2:
                dw = dw.at[:, kx].add(
                    dwk[:, 1, c * pi:c * (pi + 1), c * px:c * (px + 1)])
    dw = dw.at[:, 0].add(dwk[:, 0, LANES - c:, :c])
    dw = dw.at[:, 2].add(dwk[:, 2, :c, LANES - c:])
    return dw.astype(dtype)


# Interpreter toggle for CPU correctness tests (set before trace)
_INTERPRET = False


def set_interpret(on: bool) -> None:
    global _INTERPRET
    _INTERPRET = bool(on)
    jax.clear_caches()


@jax.custom_vjp
def conv3x3_wp(x: jax.Array, w: jax.Array) -> jax.Array:
    """3x3 SAME stride-1 conv, NHWC, Cin==Cout in {32, 64} — width-packed
    Pallas forward and backward (see module docstring).

    Compiled mode requires a <=2-byte dtype (bf16/f16): the kernels size
    VMEM for it.  Raises at trace time — a clear error beats an opaque
    on-device compile failure (interpret mode has no such limit)."""
    if not _INTERPRET and jnp.dtype(x.dtype).itemsize > 2:
        raise ValueError(
            f"conv3x3_wp: compiled kernels are VMEM-sized for <=2-byte "
            f"dtypes, got {jnp.dtype(x.dtype).name}; cast to bfloat16 or "
            f"use the XLA conv")
    return _conv3x3_wp_fwd_impl(x, pack_weights(w).astype(x.dtype))


def _wp_fwd(x, w):
    return conv3x3_wp(x, w), (x, w)


def _wp_bwd(res, g):
    x, w = res
    c = x.shape[-1]
    # dX: correlation of g with the spatially-flipped, channel-transposed
    # kernel — the same forward kernel on transformed weights.
    w_flip = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    dx = _conv3x3_wp_fwd_impl(g, pack_weights(w_flip).astype(g.dtype))
    dwk = _conv3x3_wp_dw_impl(x, g, c)
    return dx, unpack_dw(dwk, c, w.dtype)


conv3x3_wp.defvjp(_wp_fwd, _wp_bwd)
