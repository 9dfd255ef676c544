"""PGD / FGSM as compiled ``lax.scan`` loops — reference C13.

The reference uses ``torchattacks.PGD`` (`interpolation.py:8`) and keeps an
inline PGD copy in comments (`interpolation.py:54-96`): random start in the
eps-ball, ``adv += alpha * sign(grad)``, delta clamped to ±eps, pixels
clamped to the valid range; 1 step == FGSM.

Here PGD is generic over ANY differentiable scalar loss (a classifier CE, an
encoder-latent distance, a fused-image MSE …), the whole ``steps``-long loop
is one ``lax.scan`` inside one ``jit`` (zero host round-trips — the reference
pays a python iteration + several kernel launches per step), and the update
itself is the fused ``ops.pgd_update`` Pallas kernel on TPU.

Batch scaling: the returned callable works on any leading batch shape the
loss accepts; shard the batch axis of its inputs over the mesh ``data`` axis
(``tpufusion.parallel``) and XLA runs it data-parallel.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from tpufusion.ops.pgd_update import pgd_update


@dataclasses.dataclass(frozen=True)
class PGDConfig:
    """Defaults mirror the reference recipe (`interpolation.py:1343`):
    eps=8/255, alpha=0.01, steps=100, random_start=True — in [-1,1] space the
    pixel range is 2x wider, so eps doubles when reproducing [0,1] setups."""

    eps: float = 8.0 / 255.0
    alpha: float = 0.01
    steps: int = 40
    random_start: bool = True
    targeted: bool = False
    clip_min: float = -1.0
    clip_max: float = 1.0
    # lax.scan unroll factor for the step loop.  >1 inlines that many step
    # bodies per while iteration (XLA can then overlap/fuse across steps at
    # the cost of program size); measured a wash for the big fusion
    # programs (DESIGN §9) but kept as a knob.  Full unroll also makes
    # XLA's cost analysis count every step, which benchmarks/mfu_programs.py
    # uses for exact per-step FLOP/byte accounting.
    unroll: int = 1


def make_pgd(loss_fn: Callable, config: PGDConfig, *,
             external_start: bool = False):
    """Build a jitted PGD attack.

    Args:
      loss_fn: ``loss_fn(adv_images, *loss_args) -> scalar``.  Untargeted
        attacks *ascend* this loss; targeted attacks descend it
        (`interpolation.py:84-86` negates the CE for targeted mode).
      external_start: when True, the returned callable is
        ``attack(images, start, *loss_args)`` — the caller supplies the
        (already random-started) first iterate and no key is drawn.  The
        DP runners use this so the noise is drawn at the UNPADDED batch
        shape and sharded runs stay bit-equal to single-device runs.
    Returns:
      ``attack(images, key, *loss_args) -> (adv_images, loss_trace)``.
    """
    cfg = config
    sign = -1.0 if cfg.targeted else 1.0
    grad_fn = jax.value_and_grad(lambda adv, args: sign * loss_fn(adv, *args))

    def loop(images, adv, loss_args):
        def step(adv, _):
            loss, g = grad_fn(adv, loss_args)
            # ascend: pgd_update adds alpha*sign(grad) — grad of `sign*loss`
            adv = pgd_update(
                adv, g, images, cfg.alpha, cfg.eps, cfg.clip_min, cfg.clip_max
            )
            return adv, sign * loss

        return jax.lax.scan(step, adv, None, length=cfg.steps,
                            unroll=cfg.unroll)

    if external_start:

        @jax.jit
        def attack_ext(images, start, *loss_args):
            return loop(images, start, loss_args)

        return attack_ext

    @jax.jit
    def attack(images, key, *loss_args):
        if cfg.random_start:
            noise = jax.random.uniform(
                key, images.shape, images.dtype, -cfg.eps, cfg.eps
            )
            adv = jnp.clip(images + noise, cfg.clip_min, cfg.clip_max)
        else:
            adv = images
        return loop(images, adv, loss_args)

    return attack


def pgd_random_start(images, key, config: PGDConfig):
    """The random start ``make_pgd`` draws internally, exposed for the DP
    runners (drawn at the unpadded shape -> sharded == single-device)."""
    if not config.random_start:
        return images
    noise = jax.random.uniform(
        key, images.shape, images.dtype, -config.eps, config.eps)
    return jnp.clip(images + noise, config.clip_min, config.clip_max)


def fgsm(loss_fn: Callable, eps: float, *, targeted: bool = False,
         clip_min: float = -1.0, clip_max: float = 1.0):
    """Single-step PGD without random start == FGSM."""
    cfg = PGDConfig(
        eps=eps, alpha=eps, steps=1, random_start=False, targeted=targeted,
        clip_min=clip_min, clip_max=clip_max,
    )
    return make_pgd(loss_fn, cfg)
