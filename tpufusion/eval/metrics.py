"""Evaluation metrics — reference C15.

- per-image MSE (``cal_rec_loss``, `attack_main2.py:765-772`; input-noise MSE
  `interpolation.py:1406-1408`);
- grayscale SSIM (``cal_SSMI``, `attack_main2.py:823-839` — the reference
  shells to skimage on host; here SSIM is a jitted XLA program so the whole
  metric table stays on device);
- fused-image metric triple MSE/VGG-dist/SSIM (``cal_result``,
  `interpolation.py:1076-1091`);
- latent distance to the average latent (``calculate_distance``,
  `attack_main2.py:501-505`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpufusion.models.vgg16 import perceptual_distance


@jax.jit
def mse_per_image(a: jax.Array, b: jax.Array) -> jax.Array:
    """(N,H,W,C) pairs -> (N,) mean-squared errors."""
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    return jnp.mean(d * d, axis=tuple(range(1, a.ndim)))


input_noise_mse = mse_per_image  # `interpolation.py:1406-1408` alias


@jax.jit
def latent_distance(latent_avg: jax.Array, latents: jax.Array) -> jax.Array:
    """Per-sample mean MSE between codes and the average latent
    (`attack_main2.py:501-505`)."""
    d = latents.astype(jnp.float32) - latent_avg[None].astype(jnp.float32)
    return jnp.mean(d * d, axis=(1, 2))


# ITU-R 601 luma — same coefficients skimage's rgb2gray applies before the
# reference's SSIM (`attack_main2.py:832-835`).
_LUMA = jnp.asarray([0.2125, 0.7154, 0.0721])


@jax.jit
def rgb_to_gray(x: jax.Array) -> jax.Array:
    """NHWC rgb -> NHW1 luma."""
    return jnp.tensordot(x.astype(jnp.float32), _LUMA, axes=[[-1], [0]])[..., None]


def _uniform_filter(x: jax.Array, win: int) -> jax.Array:
    """VALID-window mean filter over NHW1."""
    k = jnp.full((win, win, 1, 1), 1.0 / (win * win), jnp.float32)
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@functools.partial(jax.jit, static_argnames=("win", "data_range"))
def ssim(a: jax.Array, b: jax.Array, *, win: int = 7, data_range: float = 2.0) -> jax.Array:
    """Structural similarity of grayscale image pairs — skimage
    ``structural_similarity`` defaults (win 7, uniform window, K1=.01,
    K2=.03, sample covariance normalisation).  Inputs NHWC rgb or NHW1;
    ``data_range=2`` for the [-1,1] convention.  Returns (N,)."""
    if a.shape[-1] == 3:
        a, b = rgb_to_gray(a), rgb_to_gray(b)
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    np_ = win * win
    cov_norm = np_ / (np_ - 1.0)
    ux, uy = _uniform_filter(a, win), _uniform_filter(b, win)
    uxx, uyy = _uniform_filter(a * a, win), _uniform_filter(b * b, win)
    uxy = _uniform_filter(a * b, win)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux * ux + uy * uy + c1) * (vx + vy + c2)
    )
    # fp32 variance cancellation on near-identical images can push the mean
    # a few 1e-4 past 1.0 (skimage evaluates the same formula in fp64);
    # clamp to SSIM's mathematical range — strictly closer to the fp64 value
    return jnp.clip(jnp.mean(s, axis=(1, 2, 3)), -1.0, 1.0)


def perceptual_distance_per_image(feats_a, feats_b):
    """Per-image sum of per-tap MSEs — (N,) variant of
    ``models.vgg16.perceptual_distance`` (the reference computes these one
    image at a time, `interpolation.py:1081-1085`)."""
    total = 0.0
    for a, b in zip(feats_a, feats_b):
        d = a.astype(jnp.float32) - b.astype(jnp.float32)
        total = total + jnp.mean(d * d, axis=tuple(range(1, a.ndim)))
    return total


def fused_image_metrics_with(vgg_apply, vgg_vars, pool_factor,
                             original_fused, adv_fused_all):
    """Params-explicit core of :func:`fused_image_metrics` — the single
    definition of the per-image metric triple, shared with the sharded
    group-eval (``parallel.sharding.make_sharded_group_eval``) so the two
    paths cannot drift apart.  ``vgg_apply(vgg_vars, pooled_images)`` must
    return the 4 perceptual taps."""
    from tpufusion.core.imaging import avg_pool

    orig = jnp.broadcast_to(original_fused, adv_fused_all.shape)
    mses = mse_per_image(orig, adv_fused_all)
    ssims = ssim(orig, adv_fused_all)
    feats_o = vgg_apply(vgg_vars, avg_pool(original_fused, pool_factor))
    feats_a = vgg_apply(vgg_vars, avg_pool(adv_fused_all, pool_factor))
    feats_o = jax.tree.map(
        lambda t: jnp.broadcast_to(t, (adv_fused_all.shape[0],) + t.shape[1:]),
        feats_o,
    )
    vgs = perceptual_distance_per_image(feats_a, feats_o)
    return mses, vgs, ssims


def fused_image_metrics(pipeline, original_fused, adv_fused_all):
    """``cal_result`` (`interpolation.py:1076-1091`): for each adversarial
    fused image, MSE + VGG perceptual distance + SSIM versus the benign fused
    image.  Returns three (K,) numpy-convertible arrays (the reference builds
    three dicts keyed by index; it also runs one VGG pass per image — here
    ONE batched VGG pass covers all K+1 images)."""
    return fused_image_metrics_with(
        pipeline._vgg, pipeline.vgg_vars, pipeline.pool_factor,
        original_fused, adv_fused_all)
