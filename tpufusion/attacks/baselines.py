"""Baseline perturbations — reference C12 (`attack_main2.py:273-462`).

- ``gaussian_blur_noise``: Gaussian-blur the inputs (`add_noise`, :273-282 —
  the reference shells out to cv2 per image on host; here one depthwise XLA
  conv on device).
- ``dp_noise``: Laplace/differential-privacy noise (:284-297).
- ``paste_patch``: naive paste of a resized target image (:436-462).
- ``out_domain_more`` / ``out_domain_single``: replace all / one input(s)
  with the out-of-domain target (:376-404).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpufusion.core.imaging import resize_bilinear


@functools.partial(jax.jit, static_argnames=("kernel_size", "sigma"))
def gaussian_blur_noise(images: jax.Array, kernel_size: int, sigma: float = 0.0):
    """NHWC Gaussian blur.  ``sigma<=0`` derives it from the kernel size the
    way cv2.GaussianBlur does (0.3*((k-1)*0.5 - 1) + 0.8).  ``kernel_size``
    must be odd (cv2 rejects even kernels too; SAME padding only holds for
    odd k — an even k would silently grow the spatial dims)."""
    if kernel_size % 2 == 0:
        raise ValueError(
            f"kernel_size must be odd (cv2.GaussianBlur semantics), "
            f"got {kernel_size}")
    if sigma <= 0:
        sigma = 0.3 * ((kernel_size - 1) * 0.5 - 1) + 0.8
    half = (kernel_size - 1) / 2.0
    x = jnp.arange(kernel_size, dtype=jnp.float32) - half
    k1 = jnp.exp(-(x**2) / (2.0 * sigma**2))
    k1 = k1 / jnp.sum(k1)
    k2 = jnp.outer(k1, k1)
    c = images.shape[-1]
    filt = jnp.tile(k2[:, :, None, None], (1, 1, 1, c))
    pad = kernel_size // 2
    out = jax.lax.conv_general_dilated(
        images.astype(jnp.float32), filt, (1, 1),
        ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out.astype(images.dtype)


def dp_noise(images: jax.Array, key: jax.Array, scale: float = 0.4):
    """Additive Laplace noise (`dp_noise`, :284-297; default scale from the
    ``--scale`` flag, `attack_main2.py:894`)."""
    noise = jax.random.laplace(key, images.shape, jnp.float32) * scale
    return (images.astype(jnp.float32) + noise).astype(images.dtype)


def paste_patch(images: jax.Array, target_img: jax.Array, paste_times: int = 3):
    """`get_paste_image` (:449-462): resize target to size//paste_times and
    paste centred (location (size-paste)//2, `attack_main2.py:313-314`)."""
    size = images.shape[1]
    paste_size = size // paste_times
    loc = (size - paste_size) // 2
    small = resize_bilinear(target_img, paste_size, paste_size)
    small = jnp.broadcast_to(small, (images.shape[0],) + small.shape[1:])
    return jax.lax.dynamic_update_slice(images, small.astype(images.dtype), (0, loc, loc, 0))


def out_domain_more(images: jax.Array, target_img: jax.Array):
    """Replace every input with the target (:376-381)."""
    return jnp.broadcast_to(target_img.astype(images.dtype), images.shape)


def out_domain_single(images: jax.Array, target_img: jax.Array, index: int):
    """Replace only the ``index``-th input (:390-395)."""
    return images.at[index].set(target_img[0].astype(images.dtype))
