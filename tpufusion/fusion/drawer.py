"""Fusion drawer — facade over generator + hierarchy (reference C1).

Rebuilds ``StyleFusionSimple`` (`code/style_fusion_simple.py:25-177`):
latent conversions (z / w / w+ / s), per-part s-dict assembly with the
reference's swap table (`style_fusion_simple.py:95-104`), blended synthesis
with inner-feature capture.

TPU-first differences:
- per-dataset truncation/mean-latent are computed once at build time with an
  explicit PRNG key (reference: ``mean_latent(4096)`` at ctor,
  `style_fusion_simple.py:60`);
- ``generate_img`` compiles ONE fused XLA program per swap signature
  (affines -> tree blend -> synthesis); the reference runs a python loop of
  ~11 ``general_latent_to_s`` calls then a separate synthesis pass;
- distinct input latents are converted to style vectors once and shared
  across parts (mathematically identical to the reference's per-part
  conversion of the same latent).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from tpufusion.core.dtypes import Policy, default_policy
from tpufusion.models.fusion_hierarchy import HierarchyBlender, get_all_active_parts
from tpufusion.models.stylegan2 import Generator, create_generator

# Per-dataset generator config (`style_fusion_simple.py:28-39`).
DATASET_CONFIG = {
    "ffhq": dict(truncation=0.7, size=1024, layers=18),
    "car": dict(truncation=0.5, size=512, layers=16),
    "church": dict(truncation=0.5, size=256, layers=14),
}

# The reference's swap table: keyword -> s_dict keys it overwrites, in exact
# call order (`style_fusion_simple.py:95-104`; later swaps win, e.g. ``eyes``
# overwrites ``face`` after ``mouth`` set it).
SWAP_TABLE = (
    ("hair", ("bg_hair_clothes", "hair")),
    ("face", ("face", "eyes", "skin_mouth", "mouth", "skin", "shirt")),
    ("background", ("background", "background_top", "background_bottom", "bg")),
    ("all", ("all",)),
    ("mouth", ("skin_mouth", "face")),
    ("eyes", ("eyes", "face")),
    ("wheels", ("wheels",)),
    ("car", ("car", "body", "wheels", "car_body")),
    ("bg_top", ("background_top",)),
    ("bg_bottom", ("background_bottom",)),
)


def _to_s_expr(gen: Generator, trunc: float, latents_type: str):
    """The ONE latent-type dispatch (`style_fusion_simple.py:131-144`):
    returns a traced ``expr(vars, latent, mean) -> style_vector`` shared by
    the drawer's jitted conversion wrappers and ``generate_img``'s compiled
    program.  z applies the dataset truncation; w/w+ convert at
    truncation=1 (the reference's ``general_latent_to_s`` fixes
    ``truncation=1`` for w-likes, `:140-142`); a (1, 512) single w
    broadcasts to all layers.  Unknown types raise HERE, at program-build
    time, instead of silently flowing through the 's' path."""
    n_latent = gen.n_latent
    if latents_type == "z":
        def expr(v, latent, mean):
            return gen.apply(v, [latent], truncation=trunc,
                             truncation_latent=mean,
                             return_style_vector=True)
    elif latents_type in ("w", "w+"):
        def expr(v, latent, mean):
            w = latent
            if w.ndim == 2:  # (1, 512) single w -> broadcast to all layers
                w = jnp.repeat(w[:, None, :], n_latent, axis=1)
            return gen.apply(v, [w], input_is_latent=True,
                             return_style_vector=True)
    elif latents_type == "s":
        def expr(v, latent, mean):
            return latent
    else:
        raise ValueError(
            f"latents_type must be z/w/w+/s, got {latents_type!r}")
    return expr


class FusionDrawer:
    """Holds generator + blender modules and their params; exposes pure,
    jit-cached conversion/synthesis functions."""

    def __init__(
        self,
        dataset: str,
        generator: Generator,
        gen_vars,
        blender: HierarchyBlender,
        blend_params,
        mean_latent: jax.Array,
        truncation: Optional[float] = None,
    ):
        self.dataset = dataset
        self.generator = generator
        self.gen_vars = gen_vars
        self.blender = blender
        self.blend_params = blend_params
        self.mean_latent = mean_latent
        self.truncation = (
            truncation if truncation is not None else DATASET_CONFIG[dataset]["truncation"]
        )
        self.parts = get_all_active_parts(blender.tree)

    # ------------------------------------------------------------------
    @classmethod
    def create(
        cls,
        dataset: str,
        key: jax.Array,
        *,
        size: Optional[int] = None,
        channel_multiplier: int = 2,
        policy: Optional[Policy] = None,
        remat: bool = False,
        remat_min_res: Optional[int] = None,
        mean_latent_samples: int = 4096,
        generator: Optional[Generator] = None,
        gen_vars=None,
    ) -> "FusionDrawer":
        """Build drawer with fresh (or supplied) generator + fusion nets.

        Passing ``generator``/``gen_vars`` mirrors the reference's
        ``GAN=net.decoder`` path (`attack_main2.py:930-932`) where the drawer
        wraps the e4e decoder instead of loading its own.
        """
        policy = policy or default_policy()
        cfg = DATASET_CONFIG[dataset]
        size = size or cfg["size"]
        kg, km, kb = jax.random.split(key, 3)
        if generator is None:
            generator, gen_vars = create_generator(
                size, kg, channel_multiplier=channel_multiplier, policy=policy,
                remat=remat, remat_min_res=remat_min_res,
            )
        elif gen_vars is None:
            raise ValueError(
                "gen_vars is required when a generator is supplied "
                "(the GAN=net.decoder path passes both, "
                "`attack_main2.py:930-932`)")
        mean_latent = jax.jit(
            lambda v, k: generator.apply(v, mean_latent_samples, k, method=Generator.mean_latent)
        )(gen_vars, km)
        blender = HierarchyBlender(dataset, generator.style_input_dims(), policy=policy)
        blend_params = blender.init_params(kb)
        return cls(dataset, generator, gen_vars, blender, blend_params, mean_latent)

    # ---- latent conversions (`style_fusion_simple.py:110-144`) --------
    def seed_to_z(self, seed: tuple) -> jax.Array:
        """(seed, index) -> one (1, 512) z, reproducing the reference's
        "draw index-th of index+1 normals" scheme (`:110-113`) with JAX PRNG."""
        s, idx = int(seed[0]), int(seed[1])
        z = jax.random.normal(jax.random.key(s), (idx + 1, 1, 512))
        return z[idx]

    @functools.cached_property
    def _z_to_s(self):
        return jax.jit(_to_s_expr(self.generator, self.truncation, "z"))

    def z_to_s(self, z):
        return self._z_to_s(self.gen_vars, z, self.mean_latent)

    @functools.cached_property
    def _w_plus_to_s(self):
        return jax.jit(_to_s_expr(self.generator, self.truncation, "w+"))

    def w_plus_to_s(self, w_plus, truncation: float = 1.0):
        """W+ -> s; ``truncation`` < 1 applies w-space truncation toward
        the mean latent inside the generator (`style_fusion_simple.py:125`
        passes it through to ``original_net``)."""
        if truncation == 1.0:
            return self._w_plus_to_s(self.gen_vars, w_plus, self.mean_latent)
        gen = self.generator
        cache = self.__dict__.setdefault("_w_plus_to_s_trunc", {})
        fn = cache.get(truncation)
        if fn is None:
            fn = cache[truncation] = jax.jit(
                lambda v, w, m: gen.apply(
                    v, [w], input_is_latent=True, truncation=truncation,
                    truncation_latent=m, return_style_vector=True))
        return fn(self.gen_vars, w_plus, self.mean_latent)

    def general_latent_to_s(self, latent, latent_type: str):
        """`style_fusion_simple.py:131-144`: z/w/w+/s -> s."""
        if latent_type == "z":
            return self.z_to_s(latent)
        if latent_type in ("w", "w+"):
            # the shared expr broadcasts a (1, 512) single w to all layers
            return self._w_plus_to_s(self.gen_vars, latent, self.mean_latent)
        if latent_type != "s":
            raise ValueError(f"latent_type must be z/w/w+/s, got {latent_type!r}")
        return latent  # already s

    # ---- synthesis ----------------------------------------------------
    @functools.cached_property
    def _s_to_image(self):
        gen = self.generator
        return jax.jit(lambda v, s: gen.apply(v, style_vector=s))

    def s_to_image(self, s):
        """s -> (image, inner features) (`style_fusion_simple.py:146-153`)."""
        out = self._s_to_image(self.gen_vars, s)
        return out.image, out.features

    def s_dict_to_image(self, s_dict):
        """Blend the per-part s-dict through the hierarchy, then synthesise
        (`style_fusion_simple.py:163-165`)."""
        s = self.blender.forward(self.blend_params, s_dict)
        return self.s_to_image(s)

    def w_plus_to_image(self, w_plus):
        return self.s_to_image(self.w_plus_to_s(w_plus))

    def z_to_image(self, z):
        return self.s_to_image(self.z_to_s(z))

    @functools.cached_property
    def _z_to_w_plus(self):
        gen, trunc = self.generator, self.truncation
        return jax.jit(
            lambda v, z, m: gen.apply(
                v, [z], truncation=trunc, truncation_latent=m, return_latents=True
            ).latents
        )

    def z_to_w_plus(self, z):
        """z -> broadcast W+ (`style_fusion_simple.py:120-124`)."""
        return self._z_to_w_plus(self.gen_vars, z, self.mean_latent)

    def w_plus_dict_to_image(self, w_plus_dict, truncation: float = 1.0):
        """Per-part W+ dict -> fused image (`style_fusion_simple.py:167-171`);
        ``truncation`` is applied per part exactly as the reference passes it
        through to ``w_plus_to_s`` (1.0 = plain conversion)."""
        s_dict = {k: self.w_plus_to_s(v, truncation)
                  for k, v in w_plus_dict.items()}
        return self.s_dict_to_image(self._fill_s_dict(s_dict))

    def z_dict_to_image(self, z_dict):
        """Per-part z dict -> fused image (`style_fusion_simple.py:173-177`)."""
        s_dict = {k: self.z_to_s(v) for k, v in z_dict.items()}
        return self.s_dict_to_image(self._fill_s_dict(s_dict))

    def _fill_s_dict(self, s_dict):
        """Complete a partial per-part dict: unspecified parts default to the
        'all' entry (the dict callers must provide one per reference usage)."""
        if "all" not in s_dict:
            raise ValueError("part dict needs an 'all' entry as the base")
        base = s_dict["all"]
        return {p: s_dict.get(p, base) for p in self.parts}

    # ---- generate_img (`style_fusion_simple.py:82-108`) ---------------
    def generate_img(self, base_latent, latents_type: str = "z", **part_latents):
        """Fused synthesis: seed every part with ``base_latent``, then apply
        the swap table for each provided keyword (hair/face/background/all/
        mouth/eyes/wheels/car/bg_top/bg_bottom).

        One jitted program per (latents_type, provided-keys) signature.
        """
        provided = tuple(k for k, _ in SWAP_TABLE if part_latents.get(k) is not None)
        unknown = set(part_latents) - {k for k, _ in SWAP_TABLE}
        if unknown:
            raise TypeError(f"unknown part keywords: {sorted(unknown)}")
        # per-instance cache (an lru_cache on the method would key on `self`
        # in a class-level dict and pin every drawer + its compiled programs
        # for the process lifetime)
        cache = self.__dict__.setdefault("_generate_fns", {})
        fn = cache.get((latents_type, provided))
        if fn is None:
            fn = cache[(latents_type, provided)] = self._generate_fn(
                latents_type, provided
            )
        latents = [base_latent] + [part_latents[k] for k in provided]
        out = fn(self.gen_vars, self.blend_params, self.mean_latent, *latents)
        return out.image, out.features

    def _generate_fn(self, latents_type: str, provided: tuple):
        gen, blender, trunc = self.generator, self.blender, self.truncation
        parts = tuple(self.parts)
        # the shared latent-type dispatch — validates latents_type at
        # program-BUILD time (a typo used to fall through to the 's' path
        # and fail with an opaque shape error inside the blender)
        to_s = _to_s_expr(gen, trunc, latents_type)

        def run(v, bp, mean, base, *swaps):
            s_base = to_s(v, base, mean)
            s_dict = {p: s_base for p in parts}
            # swap-table order, later swaps overwrite earlier ones
            swap_values = dict(zip(provided, swaps))
            for kw, keys in SWAP_TABLE:
                if kw in swap_values:
                    s_kw = to_s(v, swap_values[kw], mean)
                    for k in keys:
                        if k in s_dict:
                            s_dict[k] = s_kw
            s = blender.forward(bp, s_dict)
            return gen.apply(v, style_vector=s)

        return jax.jit(run)
