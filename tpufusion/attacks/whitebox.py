"""White-box pixel attack (``optimize_vgg``) — reference C9.

Reference semantics (`attack_main2.py:584-671`, variant
`interpolation.py:743-843`): Adam on the input pixels of ONE image against a
multi-term objective combining

  - encoder-latent distance to the target / away from the original,
  - decoder-reconstruction distance to the target image,
  - VGG perceptual distances (4-tap MSE sums),
  - pixel distance to the original image.

TPU-native rebuild: precomputations (target/original latents + VGG taps) are
hoisted out; each iteration — encoder fwd, decoder fwd, 2 VGG fwds, 8 MSE
terms, full backward, Adam step — is ONE fused XLA program, and the whole
``n_iters`` loop is a single ``lax.scan`` (the reference pays a python loop
with per-term kernel launches and an optional file write every 5 iters,
`attack_main2.py:657-666`; our loss traces come back as scan outputs for
post-hoc logging).  The encoder is evaluated once per step and reused for
both the decoder input and the latent loss — the reference computes it twice
(`attack_main2.py:619-622`), which is mathematically identical.

Batch scaling: ``make_whitebox_attack`` returns a single-image attack;
``vmap_whitebox`` maps it over a batch with per-image Adam states (the
reference loops images sequentially, `attack_main2.py:465-498`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from tpufusion.core.imaging import avg_pool
from tpufusion.models.vgg16 import perceptual_distance
from tpufusion.pipeline import FusionPipeline


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """Coefficients of the 8 loss terms; positive pulls toward, the
    ``latent_org`` term enters negated in the presets (push away)."""

    latent_target: float = 0.0
    latent_org: float = 0.0
    img_rec_target: float = 0.0
    img_rec_org: float = 0.0
    img_org: float = 0.0
    lpips_img: float = 0.0
    lpips_rec_target: float = 0.0
    lpips_rec_org: float = 0.0


# `attack_main2.py:649`:
#   10*l_latent_target + l_img_rec_target - l_latent_org + 20*l_img_org + l_lpips_img
PRESET_ATTACK_MAIN = LossWeights(
    latent_target=10.0, img_rec_target=1.0, latent_org=-1.0, img_org=20.0,
    lpips_img=1.0,
)

# `interpolation.py:818`:
#   (10*l_latent_target - l_latent_org) + (l_img_rec_target + 0.1*l_lpips_rec_target)
#   + (10*l_img_org + l_lpips_img)
PRESET_INTERPOLATION = LossWeights(
    latent_target=10.0, latent_org=-1.0, img_rec_target=1.0,
    lpips_rec_target=0.1, img_org=10.0, lpips_img=1.0,
)


@dataclasses.dataclass(frozen=True)
class WhiteboxConfig:
    lr: float = 1e-4  # reference default (`attack_main2.py:879`)
    n_iters: int = 100  # iter_dict 100 @1024/512, 50 @256 (`attack_main2.py:908`)
    weights: LossWeights = PRESET_ATTACK_MAIN


def default_n_iters(image_size: int) -> int:
    """The reference's ``iter_dict = {1024:100, 512:100, 256:50}``."""
    return 50 if image_size <= 256 else 100


def make_whitebox_attack(pipeline: FusionPipeline, config: WhiteboxConfig):
    """Build ``attack(img, target_img) -> (adv_img, trace)`` for one image
    (shape (1, S, S, 3)); ``trace`` is a dict of per-iter loss terms.
    """
    w = config.weights
    enc = pipeline.encode_fn()
    dec = pipeline.decode_fn()
    vgg = pipeline.vgg_fn()
    enc_vars, gen_vars, vgg_vars = (
        pipeline.enc_vars, pipeline.drawer.gen_vars, pipeline.vgg_vars,
    )
    factor = pipeline.pool_factor

    def mse(a, b):
        d = a.astype(jnp.float32) - b.astype(jnp.float32)
        return jnp.mean(d * d)

    @jax.jit
    def attack(img, target_img):
        img_org = img
        r_org = avg_pool(img_org, factor)
        r_target = avg_pool(target_img, factor)
        latent_target = jax.lax.stop_gradient(enc(enc_vars, r_target))
        latent_org = jax.lax.stop_gradient(enc(enc_vars, r_org))
        feats_target = jax.lax.stop_gradient(vgg(vgg_vars, r_target))
        feats_org = jax.lax.stop_gradient(vgg(vgg_vars, r_org))

        def loss_fn(x):
            r_x = avg_pool(x, factor)
            latent_pred = enc(enc_vars, r_x)
            img_rec = dec(gen_vars, latent_pred)
            r_rec = avg_pool(img_rec, factor)
            feats_rec = vgg(vgg_vars, r_rec)
            feats_x = vgg(vgg_vars, r_x)

            terms = dict(
                latent_target=mse(latent_target, latent_pred),
                latent_org=mse(latent_org, latent_pred),
                img_rec_target=mse(target_img, img_rec),
                img_rec_org=mse(img_org, img_rec),
                img_org=mse(img_org, x),
                lpips_img=perceptual_distance(feats_x, feats_org),
                lpips_rec_target=perceptual_distance(feats_rec, feats_target),
                lpips_rec_org=perceptual_distance(feats_rec, feats_org),
            )
            total = sum(
                getattr(w, k) * v for k, v in terms.items() if getattr(w, k) != 0.0
            )
            return total, terms

        opt = optax.adam(config.lr)

        def step(carry, _):
            x, opt_state = carry
            (loss, terms), g = jax.value_and_grad(loss_fn, has_aux=True)(x)
            updates, opt_state = opt.update(g, opt_state)
            x = optax.apply_updates(x, updates)
            terms["total"] = loss
            return (x, opt_state), terms

        (adv, _), trace = jax.lax.scan(
            step, (img, opt.init(img)), None, length=config.n_iters
        )
        return adv, trace

    return attack


def make_whitebox_stepper(pipeline: FusionPipeline, config: WhiteboxConfig):
    """Stepwise variant: ONE jitted optimisation step + a host loop.

    The scanned variant compiles the whole ``n_iters`` loop into one program;
    on deployments where the compile service struggles with very large
    modules (remote-compile tunnels), this keeps the compiled unit small.
    JAX dispatch is asynchronous, so the host loop still pipelines steps
    back-to-back on device; only the final fetch blocks.

    Returns ``(init, step)``: ``state = init(img, target)``,
    ``state, terms = step(state)``; the adversarial image is ``state["x"]``.
    """
    w = config.weights
    enc = pipeline.encode_fn()
    dec = pipeline.decode_fn()
    vgg = pipeline.vgg_fn()
    enc_vars, gen_vars, vgg_vars = (
        pipeline.enc_vars, pipeline.drawer.gen_vars, pipeline.vgg_vars,
    )
    factor = pipeline.pool_factor
    opt = optax.adam(config.lr)

    def mse(a, b):
        d = a.astype(jnp.float32) - b.astype(jnp.float32)
        return jnp.mean(d * d)

    @jax.jit
    def init(img, target_img):
        r_org = avg_pool(img, factor)
        r_t = avg_pool(target_img, factor)
        return dict(
            x=img, img_org=img, target=target_img,
            latent_org=enc(enc_vars, r_org),
            latent_target=enc(enc_vars, r_t),
            feats_org=jax.tree.map(jax.lax.stop_gradient, vgg(vgg_vars, r_org)),
            feats_target=jax.tree.map(jax.lax.stop_gradient, vgg(vgg_vars, r_t)),
            opt_state=opt.init(img),
        )

    def loss_fn(x, st):
        r_x = avg_pool(x, factor)
        latent_pred = enc(enc_vars, r_x)
        img_rec = dec(gen_vars, latent_pred)
        r_rec = avg_pool(img_rec, factor)
        feats_rec = vgg(vgg_vars, r_rec)
        feats_x = vgg(vgg_vars, r_x)
        terms = dict(
            latent_target=mse(st["latent_target"], latent_pred),
            latent_org=mse(st["latent_org"], latent_pred),
            img_rec_target=mse(st["target"], img_rec),
            img_rec_org=mse(st["img_org"], img_rec),
            img_org=mse(st["img_org"], x),
            lpips_img=perceptual_distance(feats_x, st["feats_org"]),
            lpips_rec_target=perceptual_distance(feats_rec, st["feats_target"]),
            lpips_rec_org=perceptual_distance(feats_rec, st["feats_org"]),
        )
        total = sum(
            getattr(w, k) * v for k, v in terms.items() if getattr(w, k) != 0.0
        )
        return total, terms

    @jax.jit
    def step(state):
        (loss, terms), g = jax.value_and_grad(loss_fn, has_aux=True)(
            state["x"], state
        )
        updates, opt_state = opt.update(g, state["opt_state"])
        x = optax.apply_updates(state["x"], updates)
        terms["total"] = loss
        return dict(state, x=x, opt_state=opt_state), terms

    return init, step


def run_whitebox_stepwise(pipeline: FusionPipeline, img, target_img,
                          config: WhiteboxConfig):
    """Host-looped white-box attack (same semantics as
    ``make_whitebox_attack``; smaller compiled unit)."""
    init, step = make_whitebox_stepper(pipeline, config)
    state = init(img, target_img)
    traces = []
    for _ in range(config.n_iters):
        state, terms = step(state)
        traces.append(terms)
    trace = jax.tree.map(lambda *xs: jnp.stack(xs), *traces)
    return state["x"], trace


def vmap_whitebox(pipeline: FusionPipeline, config: WhiteboxConfig):
    """Batched white-box attack: independent Adam per image (vmapped), one
    compiled program for the whole batch.  ``attack(imgs, targets)`` with
    ``targets`` either (1,...) broadcast (white_box_target) or per-image
    (white_box_patch) — `attack_main2.py:472-482`."""
    single = make_whitebox_attack(pipeline, config)

    def one(img, target):
        return single(img[None], target[None])

    batched = jax.vmap(one)

    @jax.jit
    def attack(imgs, targets):
        if targets.shape[0] == 1:
            targets = jnp.broadcast_to(targets, imgs.shape)
        advs, traces = batched(imgs, targets)
        return advs[:, 0], traces

    return attack


def run_whitebox(
    pipeline: FusionPipeline,
    inputs,
    target_img,
    config: WhiteboxConfig,
    which_adv=None,
):
    """`white_box` of the reference (`attack_main2.py:465-498`): perturb the
    images listed in ``which_adv`` (default: all), keep the rest benign.
    Returns (adv_inputs, traces)."""
    n = inputs.shape[0]
    which = list(range(n)) if not which_adv else list(which_adv)
    attack = vmap_whitebox(pipeline, config)
    sel = jnp.asarray([i in which for i in range(n)])
    advs, traces = attack(inputs, target_img)
    mask = sel.reshape((-1,) + (1,) * (inputs.ndim - 1))
    return jnp.where(mask, advs, inputs), traces
