"""Fused Adam pixel update — moments + bias correction + step in one pass.

The white-box attack (`attack_main2.py:614-653`: ``optim.Adam([X])`` over the
adversarial pixel buffer) updates a 1024²-scale fp32 tensor every iteration.
DESIGN §9's piece table measured the standalone optax Adam update at 4.9 ms /
18% of spec bandwidth at 1024² batch-8 — an elementwise chain XLA schedules
as several fusions over four HBM-resident buffers (x, grad, mu, nu).  This
module provides the same update as ONE Pallas VPU pass (one read of each
buffer, aliased in-place writes of x/mu/nu), plus an XLA fallback spelling
the identical math for CPU and non-tiling shapes.

Semantics are bit-compatible with ``optax.adam(lr)`` defaults
(b1=0.9, b2=0.999, eps=1e-8, eps_root=0):

    mu  <- b1*mu + (1-b1)*g          nu  <- b2*nu + (1-b2)*g^2
    mu^ <- mu / (1 - b1^t)           nu^ <- nu / (1 - b2^t)
    x   <- x - lr * mu^ / (sqrt(nu^) + eps)

Like ``ops/pgd_update.py`` (whose hand kernel measured SLOWER than XLA's own
fusion on v5e and was demoted to opt-in), this is opt-in via
``TPUFUSION_FUSED_ADAM=1`` until the TPU measurement says otherwise —
the decision is recorded in DESIGN §9.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

try:  # Pallas is TPU-only at runtime; import lazily-safe.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

B1, B2, EPS = 0.9, 0.999, 1e-8


def use_fused_adam() -> bool:
    """Env gate for the white-box steppers (measured decision pending TPU)."""
    return os.environ.get("TPUFUSION_FUSED_ADAM", "0") == "1"


def adam_init(x: jax.Array) -> dict:
    """Moment state for ``fused_adam`` — same zeros optax starts from."""
    return dict(mu=jnp.zeros_like(x), nu=jnp.zeros_like(x),
                count=jnp.zeros((), jnp.int32))


def _xla_adam(x, g, mu, nu, lr, bc1, bc2):
    mu = B1 * mu + (1.0 - B1) * g
    nu = B2 * nu + (1.0 - B2) * g * g
    step = (mu / bc1) / (jnp.sqrt(nu / bc2) + EPS)
    return x - lr * step, mu, nu


def _adam_kernel(scal_ref, x_ref, g_ref, mu_ref, nu_ref,
                 x_out, mu_out, nu_out):
    lr, bc1, bc2 = scal_ref[0], scal_ref[1], scal_ref[2]
    g = g_ref[:]
    mu = B1 * mu_ref[:] + (1.0 - B1) * g
    nu = B2 * nu_ref[:] + (1.0 - B2) * g * g
    mu_out[:] = mu
    nu_out[:] = nu
    x_out[:] = x_ref[:] - lr * (mu / bc1) / (jnp.sqrt(nu / bc2) + EPS)


def _pallas_adam(x, g, mu, nu, lr, bc1, bc2, *, interpret=False):
    shape, dtype = x.shape, x.dtype
    rows = x.size // 128
    flat = lambda a: a.astype(jnp.float32).reshape(rows, 128)
    scalars = jnp.stack([jnp.asarray(lr, jnp.float32),
                         jnp.asarray(bc1, jnp.float32),
                         jnp.asarray(bc2, jnp.float32)])
    # 7 block streams (4 in + 3 out) x double buffering x tile*128*4B must
    # stay under the 16MB scoped-VMEM stack: tile=4096 allocated 20MB and
    # failed AOT compile on v5e (measured r5); 1024 -> ~7MB and the kernel
    # is bandwidth-bound, so the smaller block costs nothing.
    tile = rows
    for cand in (1024, 512, 256, 8):
        if rows % cand == 0:
            tile = cand
            break
    spec = pl.BlockSpec((tile, 128), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((rows, 128), jnp.float32)
    x2, mu2, nu2 = pl.pallas_call(
        _adam_kernel,
        grid=(rows // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 4,
        out_specs=[spec] * 3,
        out_shape=[out_shape] * 3,
        # in-place x/mu/nu: without aliasing every step would allocate and
        # copy three fresh 1024^2-scale HBM buffers
        input_output_aliases={1: 0, 3: 1, 4: 2},
        interpret=interpret,
    )(scalars, flat(x), flat(g), flat(mu), flat(nu))
    back = lambda a: a.reshape(shape).astype(dtype)
    return back(x2), back(mu2), back(nu2)


def fused_adam(x: jax.Array, g: jax.Array, state: dict, lr,
               *, use_pallas: bool | None = None):
    """One Adam step over a pixel buffer.  Returns ``(new_x, new_state)``;
    trajectories equal ``optax.adam(lr)`` exactly (tested vs optax)."""
    count = state["count"] + 1
    t = count.astype(jnp.float32)
    bc1 = 1.0 - B1 ** t
    bc2 = 1.0 - B2 ** t
    if use_pallas is None:
        use_pallas = (_HAS_PALLAS
                      and jax.default_backend() in ("tpu", "axon")
                      and use_fused_adam())
    if not use_pallas or x.size % (8 * 128) != 0:
        nx, mu, nu = _xla_adam(x, g, state["mu"], state["nu"], lr, bc1, bc2)
    else:
        nx, mu, nu = _pallas_adam(x, g, state["mu"], state["nu"],
                                  lr, bc1, bc2)
    return nx, dict(mu=mu, nu=nu, count=count)
