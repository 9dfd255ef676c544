"""Arithmetic (mean-latent) fusion — reference C8 (`interpolation.py:658-669`).

mean of N W+ latents -> one synthesis; plus per-latent reconstructions and
their inner features.  The reference loops the N reconstructions
(`interpolation.py:664-667`); here they run as one batched generator pass.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpufusion.fusion.drawer import FusionDrawer


def arithmetic_fusion(drawer: FusionDrawer, all_latents, feature_idx: int = -1):
    """``interpolation()`` of the reference.

    Args:
      all_latents: (N, n_latent, 512) W+ rows.
    Returns:
      (fused_image, individual_images, inner_features).
    """
    avg = jnp.mean(all_latents, axis=0, keepdims=True)
    fused, _ = drawer.w_plus_to_image(avg)
    singles, features = drawer.w_plus_to_image(all_latents)
    return fused, singles, features[feature_idx]
