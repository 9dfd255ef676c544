"""Carlini-Wagner L2 attack — reference C13 (inline copy
`interpolation.py:98-193`).

tanh-space Adam with best-L2 tracking: optimise w where
``adv = (tanh(w)+1)/2`` (rescaled to the image range), loss =
sum L2(adv, img) + c * f(logits), f = margin hinge on the logits
(`interpolation.py:183-193`).  The whole ``steps`` loop is one ``lax.scan``;
best-adv selection is carried as scan state (the reference's early-stop on
non-decreasing cost is a host-side break — here the scan runs the full budget
and keeps the best iterate, which dominates it in attack quality).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class CWConfig:
    c: float = 1e-4
    kappa: float = 0.0
    steps: int = 200  # reference recipe uses CW(model, steps=200) (`:1357`)
    lr: float = 0.01
    targeted: bool = False
    clip_min: float = -1.0
    clip_max: float = 1.0


def make_cw(logits_fn: Callable, config: CWConfig):
    """Build a jitted CW-L2 attack against
    ``logits_fn(images, *logits_args) -> (B, K)``.

    Returns ``attack(images, labels, *logits_args) -> (best_adv, best_l2)``;
    ``labels`` are true labels (untargeted) or target labels (targeted).
    Pass model params via ``logits_args`` — closure-captured params embed as
    HLO constants and can break large remote compiles.  NB the reference
    adapters take ``(params, images)``: wrap as
    ``make_cw(lambda x, p: logits_fn(p, x), cfg)`` and call with ``(imgs,
    labels, params)``.
    """
    cfg = config
    lo, hi = cfg.clip_min, cfg.clip_max
    scale, shift = (hi - lo) / 2.0, (hi + lo) / 2.0

    def to_tanh_space(x):
        u = jnp.clip((x - shift) / scale, -1 + 1e-6, 1 - 1e-6)
        return jnp.arctanh(u)

    def from_tanh_space(w):
        return jnp.tanh(w) * scale + shift

    def f(logits, labels):
        one_hot = jax.nn.one_hot(labels, logits.shape[-1])
        real = jnp.sum(one_hot * logits, axis=-1)  # true/target-class logit
        other = jnp.max((1 - one_hot) * logits - one_hot * 1e9, axis=-1)
        if cfg.targeted:
            return jnp.maximum(other - real, -cfg.kappa)
        return jnp.maximum(real - other, -cfg.kappa)

    @jax.jit
    def attack(images, labels, *logits_args):
        w0 = to_tanh_space(images)
        opt = optax.adam(cfg.lr)

        def cost_fn(w):
            adv = from_tanh_space(w)
            l2 = jnp.sum((adv - images) ** 2, axis=tuple(range(1, adv.ndim)))
            logits = logits_fn(adv, *logits_args)
            cost = jnp.sum(l2) + cfg.c * jnp.sum(f(logits, labels))
            return cost, (adv, l2, logits)

        def step(carry, _):
            w, opt_state, best_adv, best_l2 = carry
            (cost, (adv, l2, logits)), g = jax.value_and_grad(
                cost_fn, has_aux=True)(w)
            updates, opt_state = opt.update(g, opt_state)
            w = optax.apply_updates(w, updates)
            # keep per-sample best: misclassified (f<=0 margin satisfied)
            # AND lower L2 (`interpolation.py:156-162`); the logits ride
            # out of cost_fn's aux — a second forward would cost ~+30%/step
            succ = f(logits, labels) <= 0
            better = jnp.logical_and(succ, l2 < best_l2)
            sel = better.reshape((-1,) + (1,) * (adv.ndim - 1))
            best_adv = jnp.where(sel, adv, best_adv)
            best_l2 = jnp.where(better, l2, best_l2)
            return (w, opt_state, best_adv, best_l2), cost

        init = (w0, opt.init(w0), images, jnp.full((images.shape[0],), jnp.inf))
        (w, _, best_adv, best_l2), trace = jax.lax.scan(
            step, init, None, length=cfg.steps
        )
        return best_adv, best_l2

    return attack
