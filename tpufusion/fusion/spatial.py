"""Spatial (per-part) fusion — reference C7 (`attack_main2.py:521-581`).

N role-assigned W+ latents -> one fused image + N individual reconstructions
+ their inner features.  Role maps per dataset (`attack_main2.py:526,547,566`,
with the car recon order of `interpolation.py:713-720`):

  ffhq:   [mouth, background, hair, eyes, global]   (N=5)
  car:    [wheels, bg_top, bg_bottom, body]         (N=4)
  church: [bg_top, bg_bottom, body]                 (N=3)
"""

from __future__ import annotations

import jax.numpy as jnp

from tpufusion.fusion.drawer import FusionDrawer

# role order of the latent rows, how they map onto generate_img kwargs, and
# the order the reference reconstructs the individual images in (its
# `I_all = torch.cat(...)` lists, `attack_main2.py:543,562,577`)
ROLE_MAPS = {
    "ffhq": dict(
        roles=("mouth", "background", "hair", "eyes", "global"),
        base="global",
        kwargs={"hair": "hair", "eyes": "eyes", "background": "background", "mouth": "mouth"},
        recon=("mouth", "background", "hair", "eyes", "global"),
    ),
    "car": dict(
        roles=("wheels", "bg_top", "bg_bottom", "body"),
        base="body",
        kwargs={"wheels": "wheels", "bg_top": "bg_top", "bg_bottom": "bg_bottom"},
        recon=("body", "wheels", "bg_top", "bg_bottom"),
    ),
    "church": dict(
        roles=("bg_top", "bg_bottom", "body"),
        base="body",
        kwargs={"bg_top": "bg_top", "bg_bottom": "bg_bottom"},
        recon=("body", "bg_top", "bg_bottom"),
    ),
}


def recon_index(dataset: str):
    """Permutation from latent-row order to the reference's reconstruction
    order (identity for ffhq; car/church reconstruct base-first)."""
    cfg = ROLE_MAPS[dataset]
    return [cfg["roles"].index(r) for r in cfg["recon"]]


def n_inputs(dataset: str) -> int:
    """dataset_n_dict of the reference (`attack_main2.py:909`)."""
    return len(ROLE_MAPS[dataset]["roles"])


def spatial_fusion(drawer: FusionDrawer, all_latents, feature_idx: int = -1):
    """``fusion()`` of the reference.

    Args:
      all_latents: (N, n_latent, 512) W+ rows in role order.
    Returns:
      (fused_image, individual_images (N,...), inner_features (N,...)) —
      same triple as `attack_main2.py:581`.
    """
    cfg = ROLE_MAPS[drawer.dataset]
    roles = cfg["roles"]
    if all_latents.shape[0] != len(roles):
        raise ValueError(
            f"{drawer.dataset} spatial fusion needs {len(roles)} latents, got {all_latents.shape[0]}"
        )
    by_role = {r: all_latents[i][None] for i, r in enumerate(roles)}

    kwargs = {kw: by_role[role] for kw, role in cfg["kwargs"].items()}
    fused, _ = drawer.generate_img(by_role[cfg["base"]], latents_type="w", **kwargs)

    # Individual reconstructions: the reference runs each latent through the
    # blender with identical parts (`attack_main2.py:532-542`), which is the
    # identity blend (g*a + (1-g)*a = a) — so one *batched* synthesis pass is
    # mathematically equivalent and N times fewer generator launches.  Rows
    # come back in the reference's reconstruction order (`recon`; base-first
    # for car/church, latent order for ffhq).
    order = jnp.asarray(recon_index(drawer.dataset))
    singles, features = drawer.w_plus_to_image(all_latents[order])
    return fused, singles, features[feature_idx]
