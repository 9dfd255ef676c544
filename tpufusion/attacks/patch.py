"""Adversarial patch attack — reference C10 + patch utils C11.

Reference (`code/attack/patch/adversarial_patch.py:26-160`): loop over a
training set; per batch, randomly rotate+place the patch
(``square_transform``/``circle_transform`` from the external
``adversarial_patch_util``), then an inner loop of ``max_count`` raw
gradient-descent steps on the patch maximising the encoder-latent drift of
the patched image (loss ``-l_latent_org_adv``, `:126`; update
``patch -= adv_grad``, `:135`; clamp to the source-image range, `:138`);
the patch is cropped back out (``submatrix``) between batches and persisted
as mask/patch ``.npz`` (`:238-239`).

TPU-native rebuild:
- the transforms are jittable JAX ops (rot90 ``lax.switch`` for squares,
  bilinear grid-sample rotation for circles) instead of host numpy/scipy —
  the reference crosses host<->device every batch (SURVEY §3.5);
- the ``max_count`` inner loop is ONE ``lax.scan`` jit; the patch gradient is
  the masked pixel gradient (mathematically equal to the reference's
  "grad wrt adv_x applied to the patch canvas" because
  d adv_x / d patch = mask);
- extraction needs no ``submatrix`` search: the placement is known, so a
  ``dynamic_slice`` crops the patch back.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpufusion.core.imaging import avg_pool
from tpufusion.models.vgg16 import perceptual_distance
from tpufusion.ops.composite import masked_composite
from tpufusion.pipeline import FusionPipeline


# ---------------------------------------------------------------------------
# C11 — patch init / transform / crop utils
# ---------------------------------------------------------------------------


def patch_side(image_size: int, patch_frac: float) -> int:
    """Square side covering ``patch_frac`` of the image area."""
    return max(int(round(math.sqrt(image_size * image_size * patch_frac))), 1)


def init_patch_square(image_size: int, patch_frac: float, key) -> jax.Array:
    """Random square patch, values in [-1, 1] (images are normalised here;
    the reference inits in [0,1] pre-normalisation space)."""
    side = patch_side(image_size, patch_frac)
    if side > image_size:
        raise ValueError(
            f"patch_frac={patch_frac} gives a {side}x{side} square patch "
            f"larger than the {image_size}x{image_size} image "
            f"(patch_frac must be <= 1)")
    return jax.random.uniform(key, (side, side, 3), minval=-1.0, maxval=1.0)


def init_patch_circle(image_size: int, patch_frac: float, key) -> jax.Array:
    """Random circular patch embedded in its bounding square; outside-circle
    pixels are zero (they never enter the mask).  ``patch_frac`` must be
    <= pi/4 (~0.785): beyond that the bounding square exceeds the image and
    the placement would fail with an opaque dynamic_update_slice error
    inside jit."""
    radius = int(round(math.sqrt(image_size * image_size * patch_frac / math.pi)))
    side = max(2 * radius, 2)
    if side > image_size:
        raise ValueError(
            f"patch_frac={patch_frac} gives a {side}x{side} bounding square "
            f"larger than the {image_size}x{image_size} image — circle "
            f"patches need patch_frac <= pi/4 (~0.785)")
    patch = jax.random.uniform(key, (side, side, 3), minval=-1.0, maxval=1.0)
    return patch * _circle_mask(side)


def _circle_mask(side: int) -> jax.Array:
    c = (side - 1) / 2.0
    yy = jnp.arange(side)[:, None] - c
    xx = jnp.arange(side)[None, :] - c
    return ((yy**2 + xx**2) <= (side / 2.0) ** 2).astype(jnp.float32)[..., None]


def _rotate_bilinear(patch: jax.Array, angle: jax.Array) -> jax.Array:
    """Rotate HWC patch by ``angle`` radians about its centre (bilinear,
    zero-fill) — jittable replacement for scipy.ndimage.rotate."""
    h, w, _ = patch.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    sy = ca * (yy - cy) - sa * (xx - cx) + cy
    sx = sa * (yy - cy) + ca * (xx - cx) + cx
    coords = jnp.stack([sy, sx])

    def sample(channel):
        return jax.scipy.ndimage.map_coordinates(channel, coords, order=1, cval=0.0)

    return jnp.stack([sample(patch[..., c]) for c in range(patch.shape[-1])], axis=-1)


def square_transform(patch: jax.Array, image_size: int, key):
    """Random 90-degree rotation + random placement -> (canvas, mask, (y, x)).

    Mirrors the external ``square_transform`` contract used at
    `adversarial_patch.py:42`: returns a full-image patch canvas and binary
    mask (here plus the placement for exact re-cropping).
    """
    krot, kloc = jax.random.split(key)
    k = jax.random.randint(krot, (), 0, 4)
    patch = jax.lax.switch(k, [lambda p: p] + [
        (lambda n: lambda p: jnp.rot90(p, n))(n) for n in (1, 2, 3)
    ], patch)
    side = patch.shape[0]
    pos = jax.random.randint(kloc, (2,), 0, image_size - side + 1)
    canvas = jnp.zeros((image_size, image_size, 3), patch.dtype)
    canvas = jax.lax.dynamic_update_slice(canvas, patch, (pos[0], pos[1], 0))
    ones = jnp.ones((side, side, 3), patch.dtype)
    mask = jax.lax.dynamic_update_slice(
        jnp.zeros((image_size, image_size, 3), patch.dtype), ones, (pos[0], pos[1], 0)
    )
    return canvas, mask, pos


def circle_transform(patch: jax.Array, image_size: int, key):
    """Arbitrary-angle rotation + random placement for circular patches
    (external ``circle_transform`` contract, `adversarial_patch.py:40`)."""
    krot, kloc = jax.random.split(key)
    angle = jax.random.uniform(krot, (), minval=0.0, maxval=2 * math.pi)
    side = patch.shape[0]
    cmask = _circle_mask(side)
    patch = _rotate_bilinear(patch, angle) * cmask
    pos = jax.random.randint(kloc, (2,), 0, image_size - side + 1)
    canvas = jnp.zeros((image_size, image_size, 3), patch.dtype)
    canvas = jax.lax.dynamic_update_slice(canvas, patch, (pos[0], pos[1], 0))
    mask3 = jnp.broadcast_to(cmask, (side, side, 3))
    mask = jax.lax.dynamic_update_slice(
        jnp.zeros((image_size, image_size, 3), patch.dtype), mask3, (pos[0], pos[1], 0)
    )
    return canvas, mask, pos


def extract_patch(canvas: jax.Array, pos, side: int) -> jax.Array:
    """Crop the patch back out of the canvas at its known placement (replaces
    the reference's ``submatrix`` bounding-box search, `:216-236`)."""
    return jax.lax.dynamic_slice(canvas, (pos[0], pos[1], 0), (side, side, 3))


def submatrix(mask_2d: np.ndarray) -> np.ndarray:
    """Host-side bounding-box crop of a nonzero region — kept for API parity
    with the external util (`adversarial_patch.py:19`)."""
    arr = np.asarray(mask_2d)
    nz = np.argwhere(arr != 0)
    if nz.size == 0:
        return arr[:0, :0]
    (y0, x0), (y1, x1) = nz.min(0), nz.max(0)
    return arr[y0 : y1 + 1, x0 : x1 + 1]


def apply_patch(inputs: jax.Array, patch_canvas: jax.Array, mask: jax.Array):
    """``patch_white_box`` composite (`attack_main2.py:413-433`): paste the
    trained patch on every image, clamped to each image's own range."""
    return jnp.stack(
        [masked_composite(inputs[i], patch_canvas, mask) for i in range(inputs.shape[0])]
    )


# ---------------------------------------------------------------------------
# C10 — patch training
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PatchConfig:
    """Defaults mirror the reference argparse (`attack_main2.py:866-876`)."""

    patch_type: str = "square"  # or "circle"
    patch_frac: float = 0.1
    max_count: int = 50
    epochs: int = 1
    # loss coefficients (`adversarial_patch.py:126`): only -l_latent_org active
    w_latent_target: float = 0.0
    w_latent_org: float = -1.0
    w_img_rec_target: float = 0.0
    w_lpips_rec_target: float = 0.0
    step_size: float = 1.0  # reference uses raw grad (`patch -= adv_grad`)
    # lax.scan unroll factor for the max_count inner loop (see
    # attacks.pgd.PGDConfig.unroll)
    unroll: int = 1


def make_patch_attack_step(pipeline: FusionPipeline, config: PatchConfig,
                           target_img: Optional[jax.Array] = None):
    """One batch of patch training as a single jitted program.

    Returns ``step(img, patch, key) -> (patch', loss_trace)`` where ``img``
    is (1, S, S, 3) and ``patch`` the small HWC patch array.
    """
    cfg = config
    enc = pipeline.encode_fn()
    dec = pipeline.decode_fn()
    vgg = pipeline.vgg_fn()
    # params travel as jit arguments (closure-captured flax variables become
    # giant HLO constants and break remote-compile services)
    model_params = dict(
        enc=pipeline.enc_vars, gen=pipeline.drawer.gen_vars, vgg=pipeline.vgg_vars,
    )
    factor = pipeline.pool_factor
    size = pipeline.image_size
    transform = square_transform if cfg.patch_type == "square" else circle_transform
    need_rec = cfg.w_img_rec_target != 0.0 or cfg.w_lpips_rec_target != 0.0
    # target precomputation only when a target exists AND some target-weighted
    # term is active (default reference weights use none of them, `:126`)
    need_target = target_img is not None and (
        cfg.w_latent_target != 0.0 or need_rec
    )

    def mse(a, b):
        d = a.astype(jnp.float32) - b.astype(jnp.float32)
        return jnp.mean(d * d)

    @jax.jit
    def step_impl(params, target, img, patch, key):
        canvas, mask, pos = transform(patch, size, key)
        latent_org = jax.lax.stop_gradient(enc(params["enc"], avg_pool(img, factor)))
        if need_target:
            r_t = avg_pool(target, factor)
            latent_target = jax.lax.stop_gradient(enc(params["enc"], r_t))
            feats_target = jax.lax.stop_gradient(vgg(params["vgg"], r_t))

        cmin, cmax = jnp.min(img), jnp.max(img)

        def loss_fn(canvas_):
            adv = (1.0 - mask) * img + mask * canvas_[None]
            adv_latent = enc(params["enc"], avg_pool(adv, factor))
            loss = cfg.w_latent_org * mse(latent_org, adv_latent)
            if need_target:
                loss = loss + cfg.w_latent_target * mse(latent_target, adv_latent)
                if need_rec:
                    rec = dec(params["gen"], adv_latent)
                    loss = loss + cfg.w_img_rec_target * mse(target, rec)
                    if cfg.w_lpips_rec_target != 0.0:
                        feats_rec = vgg(params["vgg"], avg_pool(rec, factor))
                        loss = loss + cfg.w_lpips_rec_target * perceptual_distance(
                            feats_rec, feats_target
                        )
            return loss

        grad_fn = jax.value_and_grad(loss_fn)

        def inner(canvas_, _):
            loss, g = grad_fn(canvas_)
            canvas_ = canvas_ - cfg.step_size * mask * g
            canvas_ = jnp.clip(canvas_, cmin, cmax)
            return canvas_, loss

        canvas, trace = jax.lax.scan(inner, canvas, None,
                                     length=cfg.max_count, unroll=cfg.unroll)
        new_patch = extract_patch(canvas, pos, patch.shape[0])
        return new_patch, trace

    tgt = target_img if need_target else jnp.zeros((1, size, size, 3))

    def step(img, patch, key):
        return step_impl(model_params, tgt, img, patch, key)

    step.jitted = step_impl
    return step


def train_patch(
    pipeline: FusionPipeline,
    images: Iterable,
    key: jax.Array,
    config: PatchConfig = PatchConfig(),
    target_img: Optional[jax.Array] = None,
    log_fn=None,
):
    """Full patch training (`adversarial_patch.py:main` + ``train``): epochs
    x dataset loop of ``make_patch_attack_step``; returns the final
    full-canvas (patch, mask) pair ready for ``apply_patch``.

    ``images`` yields (1, S, S, 3) arrays (the reference trains with
    batch-size-1 loaders, `attack_main2.py:928`).
    """
    cfg = config
    init = init_patch_square if cfg.patch_type == "square" else init_patch_circle
    key, kinit = jax.random.split(key)
    patch = init(pipeline.image_size, cfg.patch_frac, kinit)
    step = make_patch_attack_step(pipeline, cfg, target_img)

    if cfg.epochs > 1:
        images = list(images)  # one-shot iterables must survive re-iteration

    for epoch in range(cfg.epochs):
        for i, img in enumerate(images):
            key, k = jax.random.split(key)
            patch, trace = step(jnp.asarray(img), patch, k)
            if log_fn is not None:
                log_fn(epoch, i, np.asarray(trace))

    return canonical_canvas(patch, pipeline.image_size, cfg.patch_type)


def canonical_canvas(patch: jax.Array, image_size: int, patch_type: str):
    """Final (canvas, mask) pair from a trained patch: centre placement, no
    rotation — the layout ``apply_patch`` consumes and ``patch.npz``
    persists (`adversarial_patch.py:238-239`)."""
    side = patch.shape[0]
    size = image_size
    pos = ((size - side) // 2, (size - side) // 2)
    canvas = jax.lax.dynamic_update_slice(
        jnp.zeros((size, size, 3), patch.dtype), patch, (pos[0], pos[1], 0)
    )
    if patch_type == "circle":
        m = jnp.broadcast_to(_circle_mask(side), (side, side, 3))
    else:
        m = jnp.ones((side, side, 3), patch.dtype)
    mask = jax.lax.dynamic_update_slice(
        jnp.zeros((size, size, 3), patch.dtype), m.astype(patch.dtype), (pos[0], pos[1], 0)
    )
    return canvas, mask
