"""Fusion-aware PGD/FGSM — attacks differentiating through the WHOLE fusion
pipeline (BASELINE.json configs 1-3).

The reference's attacks differentiate through encoder/decoder per-image; the
benchmark configs additionally name attacks *on the fusion output*:
"1-step FGSM on arithmetic fusion", "PGD-40 subtle-perturbation attack on
arithmetic fusion", "spatial-fusion PGD with VGG perceptual-loss objective".
Here the differentiated graph is the full pipeline

    adv inputs (N,S,S,3) -> pool -> e4e -> [mean W+ | hierarchy blend] ->
    StyleGAN2 synthesis -> fused image -> pixel-MSE or VGG objective

and the PGD loop perturbs ALL N inputs jointly under one L-inf ball — a
strictly stronger attack than the reference's per-image surrogates (it aims
directly at the quantity the evaluation measures).
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp

from tpufusion.attacks.pgd import PGDConfig, make_pgd
from tpufusion.core.imaging import avg_pool
from tpufusion.fusion.spatial import ROLE_MAPS
from tpufusion.models.vgg16 import perceptual_distance
from tpufusion.pipeline import FusionPipeline


def make_fused_image_fn(pipeline: FusionPipeline, mode: str = "arithmetic"):
    """Differentiable ``fused(params, inputs) -> (1,S,S,3)`` through the full
    pipeline.  ``mode``: 'arithmetic' (mean W+) or 'spatial' (hierarchy
    blend with the dataset role map)."""
    enc = pipeline.encode_fn()
    gen = pipeline.generator
    blender = pipeline.drawer.blender
    factor = pipeline.pool_factor
    latent_avg = pipeline.latent_avg
    is_cars = pipeline.is_cars
    parts = tuple(pipeline.drawer.parts)
    role_cfg = ROLE_MAPS[pipeline.dataset]
    from tpufusion.fusion.drawer import SWAP_TABLE

    def latents_of(params, inputs):
        # the ONE latent definition (pipeline.latents_with) — traced here
        # with params passed as program inputs
        from tpufusion.pipeline import latents_with

        return latents_with(enc, params["enc"], latent_avg, factor,
                            is_cars, inputs)

    if mode == "arithmetic":

        def fused(params, inputs):
            codes = latents_of(params, inputs)
            avg = jnp.mean(codes, axis=0, keepdims=True)
            return gen.apply(params["gen"], [avg], input_is_latent=True).image

    elif mode == "spatial":
        roles = role_cfg["roles"]
        kwargs_map = role_cfg["kwargs"]
        base_role = role_cfg["base"]

        def fused(params, inputs):
            if inputs.shape[0] != len(roles):
                # JAX silently clamps out-of-range row indices — validate
                # explicitly like fusion/spatial.py does
                raise ValueError(
                    f"{pipeline.dataset} spatial fusion needs {len(roles)} "
                    f"inputs, got {inputs.shape[0]}"
                )
            codes = latents_of(params, inputs)
            by_role = {r: codes[i][None] for i, r in enumerate(roles)}

            def to_s(latent):
                return gen.apply(params["gen"], [latent], input_is_latent=True,
                                 return_style_vector=True)

            # convert each distinct role latent ONCE (the drawer hoists the
            # base conversion the same way, drawer._generate_fn)
            s_base = to_s(by_role[base_role])
            s_dict = {p: s_base for p in parts}
            for kw, keys in SWAP_TABLE:
                if kw in kwargs_map:
                    s_kw = to_s(by_role[kwargs_map[kw]])
                    for k in keys:
                        if k in s_dict:
                            s_dict[k] = s_kw
            s = blender.forward(params["blend"], s_dict)
            return gen.apply(params["gen"], style_vector=s).image

    else:
        raise ValueError(f"mode must be 'arithmetic' or 'spatial', got {mode!r}")

    return fused


@dataclasses.dataclass(frozen=True)
class FusionAttackConfig:
    mode: str = "arithmetic"  # or "spatial"
    objective: str = "pixel"  # 'pixel' (MSE) or 'vgg' (perceptual taps)
    targeted: bool = True  # pull fused image toward `target`; False: away
    pgd: PGDConfig = PGDConfig(eps=8 / 255 * 2, alpha=0.01 * 2, steps=40)


def make_fusion_attack(pipeline: FusionPipeline, config: FusionAttackConfig):
    """Build ``attack(inputs, target_fused, key) -> (adv_inputs, trace)``.

    ``inputs``: the (N, S, S, 3) fusion batch; ``target_fused``: a (1, S, S,
    3) image the fused output should approach (targeted) or the benign fused
    image it should flee (untargeted).
    """
    fused_fn = make_fused_image_fn(pipeline, config.mode)
    vgg = pipeline.vgg_fn()
    factor = pipeline.pool_factor
    params = dict(
        enc=pipeline.enc_vars,
        gen=pipeline.drawer.gen_vars,
        blend=pipeline.drawer.blend_params,
        vgg=pipeline.vgg_vars,
    )

    if config.objective == "pixel":

        def loss_fn(adv, params_, target):
            f = fused_fn(params_, adv)
            d = f.astype(jnp.float32) - target.astype(jnp.float32)
            return jnp.mean(d * d)

    elif config.objective == "vgg":

        def loss_fn(adv, params_, target):
            f = fused_fn(params_, adv)
            fa = vgg(params_["vgg"], avg_pool(f, factor))
            fb = vgg(params_["vgg"], avg_pool(target, factor))
            return perceptual_distance(fa, fb)

    else:
        raise ValueError(f"objective must be 'pixel' or 'vgg', got {config.objective!r}")

    pgd = make_pgd(
        loss_fn,
        dataclasses.replace(config.pgd, targeted=config.targeted),
    )

    def attack(inputs, target_fused, key):
        return pgd(inputs, key, params, target_fused)

    attack.jitted = pgd
    return attack


def fgsm_on_fusion(pipeline: FusionPipeline, eps: float = 8 / 255 * 2,
                   mode: str = "arithmetic", objective: str = "pixel",
                   targeted: bool = True):
    """1-step FGSM on the fused output (BASELINE config 1)."""
    cfg = FusionAttackConfig(
        mode=mode, objective=objective, targeted=targeted,
        pgd=PGDConfig(eps=eps, alpha=eps, steps=1, random_start=False),
    )
    return make_fusion_attack(pipeline, cfg)
