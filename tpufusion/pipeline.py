"""FusionPipeline — the model bundle every driver/attack works against.

Mirrors the reference's setup block (`attack_main2.py:920-945`): an e4e
encoder + StyleGAN2 decoder pair (pSp, `utils/model_utils.py:7-18`), the
StyleFusion drawer wrapping the same decoder (`attack_main2.py:930-932`),
and the VGG16 perceptual stack (`attack_main2.py:912`).

All members are pure (module, params) pairs; the convenience methods build
jit-cached callables.  ``pool_factor`` is the generator-size/256 average-pool
the reference applies before every encoder/VGG call
(`attack_main2.py:590-591,619-624`).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from tpufusion.core.dtypes import Policy, default_policy
from tpufusion.core.imaging import avg_pool
from tpufusion.fusion.drawer import FusionDrawer
from tpufusion.models.e4e import Encoder4Editing, create_encoder
from tpufusion.models.vgg16 import VGG16, create_vgg16


def latents_with(enc_apply, enc_vars, latent_avg, pool_factor: int,
                 is_cars: bool, images):
    """Params-explicit core of :meth:`FusionPipeline.get_latents`
    (`attack_main2.py:137-146`: encoder + latent-average offset + cars
    18->16 trim) — the ONE latent definition, shared with the traced
    attack/eval programs (``attacks.fusion_attack``,
    ``parallel.sharding``) so the paths cannot drift."""
    codes = enc_apply(enc_vars, avg_pool(images, pool_factor))
    codes = codes + latent_avg[None].astype(codes.dtype)
    if is_cars and codes.shape[1] == 18:
        codes = codes[:, :16]
    return codes


@dataclasses.dataclass
class FusionPipeline:
    dataset: str
    drawer: FusionDrawer
    encoder: Encoder4Editing
    enc_vars: dict
    vgg: VGG16
    vgg_vars: dict
    latent_avg: jax.Array  # (n_latent, 512)
    policy: Policy
    encoder_input_size: int = 256

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
        encoder_base_channels: int = 64,
        encoder_units=(3, 4, 14, 3),
        encoder_input_size: int = 256,
    ) -> "FusionPipeline":
        """Build the full bundle with fresh params.  Shrink
        ``encoder_base_channels``/``encoder_units``/``encoder_input_size``
        and ``size`` for tests; converters fill real checkpoint weights."""
        policy = policy or default_policy()
        kd, ke, kv = jax.random.split(key, 3)
        drawer = FusionDrawer.create(
            dataset, kd, size=size, channel_multiplier=channel_multiplier,
            policy=policy, remat=remat, remat_min_res=remat_min_res,
            mean_latent_samples=mean_latent_samples,
        )
        n_styles = drawer.generator.n_latent
        encoder, enc_vars = create_encoder(
            ke, n_styles, image_size=encoder_input_size,
            base_channels=encoder_base_channels, unit_counts=encoder_units,
            policy=policy,
        )
        vgg, vgg_vars = create_vgg16(kv, policy=policy, image_size=encoder_input_size)
        latent_avg = jnp.repeat(drawer.mean_latent, n_styles, axis=0)
        return cls(
            dataset=dataset, drawer=drawer, encoder=encoder, enc_vars=enc_vars,
            vgg=vgg, vgg_vars=vgg_vars, latent_avg=latent_avg, policy=policy,
            encoder_input_size=encoder_input_size,
        )

    # ------------------------------------------------------------------
    @property
    def generator(self):
        return self.drawer.generator

    @property
    def image_size(self) -> int:
        return self.generator.size

    @property
    def pool_factor(self) -> int:
        return max(self.image_size // self.encoder_input_size, 1)

    @property
    def is_cars(self) -> bool:
        return "car" in self.dataset

    # ---- persistence ---------------------------------------------------
    def save(self, directory: str) -> str:
        """Persist every params pytree (+ fusion nets + mean latent) as .npz
        so a pipeline resumes without re-init/re-conversion (the model-side
        checointing the reference lacks, SURVEY §5)."""
        import json
        import os

        from tpufusion.io.params_io import save_pytree

        os.makedirs(directory, exist_ok=True)
        save_pytree(self.drawer.gen_vars, os.path.join(directory, "generator.npz"))
        save_pytree(self.enc_vars, os.path.join(directory, "encoder.npz"))
        save_pytree(self.vgg_vars, os.path.join(directory, "vgg.npz"))
        save_pytree(self.drawer.blend_params, os.path.join(directory, "fusion_nets.npz"))
        save_pytree(
            dict(mean_latent=self.drawer.mean_latent, latent_avg=self.latent_avg),
            os.path.join(directory, "latents.npz"),
        )
        meta = dict(
            dataset=self.dataset,
            size=self.image_size,
            channel_multiplier=self.generator.channel_multiplier,
            encoder_input_size=self.encoder_input_size,
            encoder_base_channels=self.encoder.base_channels,
            encoder_units=list(self.encoder.unit_counts),
            n_styles=self.encoder.n_styles,
        )
        with open(os.path.join(directory, "pipeline.json"), "w") as f:
            json.dump(meta, f, indent=2)
        return directory

    @classmethod
    def load(cls, directory: str, *, policy: Optional[Policy] = None,
             remat: bool = False,
             remat_min_res: Optional[int] = None) -> "FusionPipeline":
        """Rebuild a pipeline from ``save`` output.

        Constructs the flax modules WITHOUT running their random inits (load
        cost is just npz I/O — module dataclasses carry no params)."""
        import json
        import os

        from tpufusion.io.params_io import load_pytree
        from tpufusion.models.e4e import Encoder4Editing
        from tpufusion.models.fusion_hierarchy import HierarchyBlender
        from tpufusion.models.stylegan2 import Generator

        with open(os.path.join(directory, "pipeline.json")) as f:
            meta = json.load(f)
        policy = policy or default_policy()

        generator = Generator(
            size=meta["size"], channel_multiplier=meta["channel_multiplier"],
            policy=policy, remat=remat, remat_min_res=remat_min_res,
        )
        gen_vars = load_pytree(os.path.join(directory, "generator.npz"))
        blender = HierarchyBlender(
            meta["dataset"], generator.style_input_dims(), policy=policy
        )
        blend_params = load_pytree(os.path.join(directory, "fusion_nets.npz"))
        lat = load_pytree(os.path.join(directory, "latents.npz"))
        drawer = FusionDrawer(
            meta["dataset"], generator, gen_vars, blender, blend_params,
            jnp.asarray(lat["mean_latent"]),
        )
        encoder = Encoder4Editing(
            n_styles=meta["n_styles"],
            base_channels=meta["encoder_base_channels"],
            unit_counts=tuple(meta["encoder_units"]),
            policy=policy,
        )
        vgg = VGG16(policy=policy)
        return cls(
            dataset=meta["dataset"], drawer=drawer,
            encoder=encoder,
            enc_vars=load_pytree(os.path.join(directory, "encoder.npz")),
            vgg=vgg,
            vgg_vars=load_pytree(os.path.join(directory, "vgg.npz")),
            latent_avg=jnp.asarray(lat["latent_avg"]),
            policy=policy,
            encoder_input_size=meta["encoder_input_size"],
        )

    # ---- pure apply fns (for building attack losses) -----------------
    def encode_fn(self):
        """images (already encoder-sized) -> raw W+ codes (no latent_avg) —
        the form the white-box loss uses (`attack_main2.py:597-598,622`)."""
        enc = self.encoder
        return lambda vars_, x: enc.apply(vars_, x)

    def decode_fn(self):
        """raw W+ codes -> image (``decoder([codes], input_is_latent=True)``,
        `attack_main2.py:619-621`)."""
        gen = self.generator
        return lambda vars_, w: gen.apply(vars_, [w], input_is_latent=True).image

    def vgg_fn(self):
        vgg = self.vgg
        return lambda vars_, x: vgg.apply(vars_, x)

    # ---- convenience jitted wrappers ----------------------------------
    @functools.cached_property
    def _encode(self):
        return jax.jit(self.encode_fn())

    @functools.cached_property
    def _decode(self):
        return jax.jit(self.decode_fn())

    @functools.cached_property
    def _vgg(self):
        return jax.jit(self.vgg_fn())

    def pool_to_encoder(self, images):
        return avg_pool(images, self.pool_factor)

    def encode(self, images):
        """Full-resolution images -> raw codes (pools first)."""
        return self._encode(self.enc_vars, self.pool_to_encoder(images))

    def get_latents(self, images):
        """C5 ``get_latents`` (`attack_main2.py:137-146`): encoder + latent
        average offset + cars 18->16 trim (core: :func:`latents_with`)."""
        return latents_with(self._encode, self.enc_vars, self.latent_avg,
                            self.pool_factor, self.is_cars, images)

    def decode(self, w_plus):
        return self._decode(self.drawer.gen_vars, w_plus)

    def vgg_feats(self, images):
        """Pools to encoder size then extracts the 4 perceptual taps."""
        return self._vgg(self.vgg_vars, self.pool_to_encoder(images))


def create_test_pipeline(dataset: str = "ffhq", key=None, size: int = 32):
    """Tiny pipeline for CPU tests: 32^2 generator, 4-block thin encoder."""
    key = key if key is not None else jax.random.key(0)
    return FusionPipeline.create(
        dataset, key, size=size, channel_multiplier=1, policy=Policy(),
        mean_latent_samples=32, encoder_base_channels=16,
        encoder_units=(1, 1, 1, 1), encoder_input_size=size,
    )
