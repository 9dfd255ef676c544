"""Partial-fusion evaluation harness — reference C14
(`interpolation.py:921-1074`).

For j in 0..N: substitute only the j-th adversarial latent into the benign
batch, fuse, and collect the fused image; the j==N case fuses the
all-adversarial batch.  Runs for both fusion modes (arithmetic
`interpolation.py:921-976`, spatial `:978-1031`).

TPU-native: the N+1 latent variants are built as one stacked tensor and BOTH
modes run as one batched synthesis dispatch — arithmetic collapses the N+1
means into the batch; spatial makes the variant axis the batch of every
role's latent, so affines + hierarchy blend + synthesis execute once at
batch N+1 (measured 4.9× over the per-variant loop at 1024², docs/DESIGN.md
§9; the reference re-runs ``fusion()`` per j with fresh eager graphs).
"""

from __future__ import annotations

import jax.numpy as jnp

from tpufusion.fusion.arithmetic import arithmetic_fusion
from tpufusion.fusion.drawer import FusionDrawer
from tpufusion.fusion.spatial import spatial_fusion


def partial_latent_variants(all_latents, all_adv_latents):
    """(N+1, N, n_latent, 512): variant j has row j adversarial; variant N is
    fully adversarial (`interpolation.py:924-933`)."""
    n = all_latents.shape[0]
    variants = []
    for j in range(n):
        variants.append(all_latents.at[j].set(all_adv_latents[j]))
    variants.append(all_adv_latents)
    return jnp.stack(variants)


def partial_adv_fusion(drawer: FusionDrawer, all_latents, all_adv_latents,
                       mode: str = "spatial"):
    """Fused images for every partial substitution.

    Returns (N+1, H, W, 3): row j = fusion with only latent j adversarial,
    last row = all adversarial.
    """
    variants = partial_latent_variants(all_latents, all_adv_latents)
    if mode == "arithmetic":
        # all N+1 means in one batched synthesis
        means = jnp.mean(variants, axis=1)  # (N+1, n_latent, 512)
        fused, _ = drawer.w_plus_to_image(means)
        return fused
    if mode == "spatial":
        # ONE batched program for all N+1 variants: per role, the variant
        # axis becomes the batch of that role's latent — affines, tree blend
        # and synthesis all run once at batch N+1 instead of N+1 sequential
        # dispatches (the reference re-runs fusion() per j,
        # `interpolation.py:978-1031`)
        from tpufusion.fusion.spatial import ROLE_MAPS

        cfg = ROLE_MAPS[drawer.dataset]
        if variants.shape[1] != len(cfg["roles"]):
            raise ValueError(
                f"{drawer.dataset} spatial fusion needs "
                f"{len(cfg['roles'])} latents, got {variants.shape[1]}")
        by_role = {r: variants[:, i] for i, r in enumerate(cfg["roles"])}
        kwargs = {kw: by_role[role] for kw, role in cfg["kwargs"].items()}
        fused, _ = drawer.generate_img(
            by_role[cfg["base"]], latents_type="w", **kwargs
        )
        return fused
    raise ValueError(f"mode must be 'spatial' or 'arithmetic', got {mode!r}")


def benign_fusion(drawer: FusionDrawer, all_latents, mode: str = "spatial"):
    """`benign_fusion_spatial/arithmetic` (`interpolation.py:1033-1074`):
    returns (fused, singles, features)."""
    if mode == "arithmetic":
        return arithmetic_fusion(drawer, all_latents)
    if mode == "spatial":
        return spatial_fusion(drawer, all_latents)
    raise ValueError(f"mode must be 'spatial' or 'arithmetic', got {mode!r}")
