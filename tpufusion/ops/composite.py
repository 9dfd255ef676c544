"""Masked patch composite: ``adv = (1-mask)*img + mask*patch``, clamped.

Reference: `attack_main2.py:413-419` (``patch_white_box``) and
`patch/adversarial_patch.py:106,137-138`.  The clamp bounds are the min/max of
the *source image* (the reference clamps to ``[img.min(), img.max()]``), so
they are traced scalars here.  Single fused elementwise pass; XLA fuses the
jnp expression into one kernel on TPU, so no hand-written Pallas is needed —
this is bandwidth-bound VPU work with zero reuse.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def masked_composite(
    img: jax.Array,
    patch: jax.Array,
    mask: jax.Array,
    clip_min=None,
    clip_max=None,
) -> jax.Array:
    """Composite ``patch`` over ``img`` where ``mask`` is 1, then clamp.

    Defaults reproduce the reference's source-range clamp
    (`adversarial_patch.py:138`): bounds = min/max of ``img``.
    """
    if clip_min is None:
        clip_min = jnp.min(img)
    if clip_max is None:
        clip_max = jnp.max(img)
    out = (1.0 - mask) * img + mask * patch
    return jnp.clip(out, clip_min, clip_max)
