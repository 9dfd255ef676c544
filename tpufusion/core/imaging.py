"""Image math shared by every layer.

All images in this framework are NHWC floats in [-1, 1] (the reference keeps
NCHW torch tensors with the same value range — `transforms_config.py:28-31`
normalises to mean .5 / std .5).  NHWC is the layout XLA prefers for TPU convs,
so we use it end-to-end and only convert at the file-I/O boundary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def clamp_pm1(x: jax.Array) -> jax.Array:
    return jnp.clip(x, -1.0, 1.0)


def avg_pool(x: jax.Array, factor: int) -> jax.Array:
    """Average-pool NHWC by an integer factor.

    Equivalent of the reference's ``F.avg_pool2d(img, size/256, size/256)``
    (`attack_main2.py:590-591`) used to shrink generator-resolution images to
    the 256x256 encoder/VGG input.  ``factor == 1`` is the identity.

    Implemented as two dense pooling-matrix contractions (einsum over each
    spatial axis) — on v5e this runs the pool + its VJP on the MXU at
    0.63 ms/iter for batch-8 1024^2, vs 12.7 ms for reshape+mean and
    10.4 ms for a depthwise strided conv (whose 3-channel grouped transposed
    conv backward wastes 125/128 lanes).
    """
    if factor == 1:
        return x
    n, h, w, c = x.shape
    mh = _pool_matrix(h, factor)
    mw = _pool_matrix(w, factor)
    y = jnp.einsum("oi,nijc->nojc", mh.astype(x.dtype), x)
    return jnp.einsum("pj,nojc->nopc", mw.astype(x.dtype), y)


@functools.lru_cache(maxsize=None)
def _pool_matrix(n_in: int, factor: int) -> np.ndarray:
    # cached as NUMPY (a cached jnp array would leak tracers across jits)
    m = np.zeros((n_in // factor, n_in), np.float32)
    for o in range(n_in // factor):
        m[o, o * factor : (o + 1) * factor] = 1.0 / factor
    return m


def resize_bilinear(x: jax.Array, height: int, width: int) -> jax.Array:
    """Bilinear resize of NHWC images (torchvision Resize analog)."""
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, height, width, c), method="bilinear")


def to_uint8(x) -> np.ndarray:
    """[-1,1] float NHWC -> uint8, mirroring ``tensor2im``
    (`style_fusion_simple.py:16-22`): (x+1)/2, clip to [0,1], *255."""
    x = np.asarray(jax.device_get(x), dtype=np.float32)
    x = np.clip((x + 1.0) / 2.0, 0.0, 1.0) * 255.0
    return x.astype(np.uint8)


def from_uint8(x: np.ndarray) -> np.ndarray:
    """uint8 HWC/NHWC -> [-1,1] float32 (ToTensor + Normalize(.5,.5))."""
    return np.asarray(x, dtype=np.float32) / 255.0 * 2.0 - 1.0


def montage(images, padding: int = 2, pad_value: float = -1.0) -> np.ndarray:
    """Concatenate a batch of NHWC images into one horizontal strip.

    Mirrors the geometry of the reference's ``vutils.save_image`` montages
    (5 FFHQ panels -> 5132x1028 with 2px padding, SURVEY §4): each tile gets a
    ``padding`` border; ``pad_value`` is in [-1, 1] space.
    """
    imgs = np.asarray(jax.device_get(images), dtype=np.float32)
    if imgs.ndim == 3:
        imgs = imgs[None]
    n, h, w, c = imgs.shape
    out = np.full(
        (h + 2 * padding, n * (w + padding) + padding, c),
        pad_value,
        dtype=np.float32,
    )
    for i in range(n):
        x0 = padding + i * (w + padding)
        out[padding : padding + h, x0 : x0 + w] = imgs[i]
    return out


def grid_montage(images, nrow: int = 8, padding: int = 2, pad_value: float = -1.0) -> np.ndarray:
    """vutils.save_image-style grid: ``nrow`` images per row."""
    imgs = np.asarray(jax.device_get(images), dtype=np.float32)
    if imgs.ndim == 3:
        imgs = imgs[None]
    n, h, w, c = imgs.shape
    ncol = min(nrow, n)
    nrows = (n + ncol - 1) // ncol
    out = np.full(
        (nrows * (h + padding) + padding, ncol * (w + padding) + padding, c),
        pad_value,
        dtype=np.float32,
    )
    for i in range(n):
        r, col = divmod(i, ncol)
        y0 = padding + r * (h + padding)
        x0 = padding + col * (w + padding)
        out[y0 : y0 + h, x0 : x0 + w] = imgs[i]
    return out
