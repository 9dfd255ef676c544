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

IMPORTANT (deployment-critical): model params are passed as jit ARGUMENTS,
never captured in closures — captured flax variables get embedded as HLO
constants, bloating the serialized module by hundreds of MB and breaking
remote-compile services (observed here: HTTP 413 / broken pipes).

Two execution shapes:
- ``make_whitebox_attack``: whole loop as one ``lax.scan`` program;
- ``make_whitebox_stepper``: one jitted step + async host loop (small
  compile units for toolchains that choke on giant modules).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
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
    # 'scan': whole loop as one compiled program; 'stepwise': one-step program
    # + async host loop (for toolchains that choke on giant modules)
    execution: str = "scan"
    # When set, the attack also returns mid-run snapshots {adv_input, rec}
    # taken every K iters — the reference's ``args.save_img`` dumps of
    # ``adv_input_*_%d.png`` / ``rec_*_%d.png`` (`attack_main2.py:657-661`,
    # cadence 5).  Snapshots ride out of the scan as extra outputs (one
    # compiled program, no host syncs); ``rec`` costs one extra enc+dec
    # forward per snapshot.
    snapshot_every: int | None = None
    # Microbatching (VERDICT r4 #8): split the batch into ``grad_accum``
    # sequential chunks per iteration so effective batches beyond the
    # single-chip activation ceiling (batch-8 @1024²; batch-16 OOMs at
    # 18.1 vs 15.75 GB) still run on one chip.  Per-image Adam
    # trajectories are independent, so chunked == unchunked up to fp32
    # reduction-order epsilon (the chunked program compiles at a smaller
    # batch, so XLA's fusion/reduction order differs — see
    # test_grad_accum_matches_unchunked, atol 5e-5); only one chunk's
    # fwd/bwd activations are live at a time while the full batch's state
    # (pixels + moments) stays resident.  Stepwise execution only — each
    # chunk reuses ONE compiled step program.
    grad_accum: int = 1


def default_n_iters(image_size: int) -> int:
    """The reference's ``iter_dict = {1024:100, 512:100, 256:50}``."""
    return 50 if image_size <= 256 else 100


def _mse(a, b):
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    return jnp.mean(d * d)


def _model_params(pipeline: FusionPipeline) -> dict:
    return dict(
        enc=pipeline.enc_vars,
        gen=pipeline.drawer.gen_vars,
        vgg=pipeline.vgg_vars,
    )


def _make_loss(pipeline: FusionPipeline, weights: LossWeights):
    """loss(params, x, ref) -> (total, terms); params are explicit args."""
    enc = pipeline.encode_fn()
    dec = pipeline.decode_fn()
    vgg = pipeline.vgg_fn()
    factor = pipeline.pool_factor
    w = weights

    def loss_fn(params, x, ref):
        r_x = avg_pool(x, factor)
        latent_pred = enc(params["enc"], r_x)
        img_rec = dec(params["gen"], latent_pred)
        r_rec = avg_pool(img_rec, factor)
        # NB a single batch-2B VGG pass over concat([r_x, r_rec]) was
        # measured IDENTICAL (163.7 vs 162.2 ms/step on v5e) — the program
        # is bandwidth-bound, so kernel-count micro-optimisations don't move
        # it; keep the simpler two-call form
        feats_rec = vgg(params["vgg"], r_rec)
        feats_x = vgg(params["vgg"], r_x)
        terms = dict(
            latent_target=_mse(ref["latent_target"], latent_pred),
            latent_org=_mse(ref["latent_org"], latent_pred),
            img_rec_target=_mse(ref["target"], img_rec),
            img_rec_org=_mse(ref["img_org"], img_rec),
            img_org=_mse(ref["img_org"], x),
            lpips_img=perceptual_distance(feats_x, ref["feats_org"]),
            lpips_rec_target=perceptual_distance(feats_rec, ref["feats_target"]),
            lpips_rec_org=perceptual_distance(feats_rec, ref["feats_org"]),
        )
        total = sum(
            getattr(w, k) * v for k, v in terms.items() if getattr(w, k) != 0.0
        )
        return total, terms

    return loss_fn


def _make_ref(pipeline: FusionPipeline):
    """Precompute the stop-gradient reference bundle (target/org latents +
    VGG taps — `attack_main2.py:596-603`)."""
    enc = pipeline.encode_fn()
    vgg = pipeline.vgg_fn()
    factor = pipeline.pool_factor

    def ref_fn(params, img, target_img):
        r_org = avg_pool(img, factor)
        r_t = avg_pool(target_img, factor)
        return jax.lax.stop_gradient(dict(
            img_org=img,
            target=target_img,
            latent_org=enc(params["enc"], r_org),
            latent_target=enc(params["enc"], r_t),
            feats_org=vgg(params["vgg"], r_org),
            feats_target=vgg(params["vgg"], r_t),
        ))

    return ref_fn


def _pixel_opt(lr):
    """Adam over the adversarial pixel buffer (`attack_main2.py:614`
    ``optim.Adam([X])``): optax by default; ONE fused Pallas VPU pass
    (``ops/adam_update.py``) when ``TPUFUSION_FUSED_ADAM=1``.  Trajectories
    are identical either way (tested vs optax) — the gate only changes how
    many HBM passes the update costs.  Returns ``(init, apply)`` with
    ``x, st = apply(g, x, st)``."""
    from tpufusion.ops.adam_update import (
        adam_init, fused_adam, use_fused_adam,
    )

    if use_fused_adam():
        return adam_init, lambda g, x, st: fused_adam(x, g, st, lr)
    opt = optax.adam(lr)

    def apply(g, x, st):
        updates, st = opt.update(g, st)
        return optax.apply_updates(x, updates), st

    return opt.init, apply


def make_whitebox_attack(pipeline: FusionPipeline, config: WhiteboxConfig):
    """Build ``attack(img, target_img) -> (adv_img, trace)``; works on a
    (1, S, S, 3) image or a naturally-batched (B, S, S, 3) batch (batched
    means average the loss terms over the batch; use ``vmap_whitebox`` for
    strictly per-image trajectories).  ``trace`` is a dict of per-iter loss
    terms."""
    if config.grad_accum > 1:
        raise ValueError(
            "grad_accum > 1 requires execution='stepwise': the scan executor "
            "compiles the whole batch's fwd/bwd into one program, so there "
            "is no sequential chunk boundary to bound activation memory")
    loss_fn = _make_loss(pipeline, config.weights)
    ref_fn = _make_ref(pipeline)
    opt_init, opt_apply = _pixel_opt(config.lr)
    n_iters = config.n_iters
    every = config.snapshot_every
    enc = pipeline.encode_fn()
    dec = pipeline.decode_fn()
    factor = pipeline.pool_factor

    @jax.jit
    def attack_impl(params, img, target_img):
        ref = ref_fn(params, img, target_img)

        def step(carry, _):
            x, opt_state = carry
            (loss, terms), g = jax.value_and_grad(loss_fn, argnums=1, has_aux=True)(
                params, x, ref
            )
            x, opt_state = opt_apply(g, x, opt_state)
            terms["total"] = loss
            return (x, opt_state), terms

        carry = (img, opt_init(img))
        if not every:
            (adv, _), trace = jax.lax.scan(step, carry, None, length=n_iters)
            return adv, trace

        # reference cadence (`attack_main2.py:657`): the save check runs
        # AFTER optimizer.step() at loop index `iters`, firing when
        # iters % every == 0 and iters // every > 0 — i.e. frame k lands
        # after k*every + 1 steps and the FINAL iteration never snapshots.
        # Structure: 1 lead step, then (n_iters-1)//every snapshot chunks,
        # then the remainder.
        n_snap = max((n_iters - 1) // every, 0)
        lead = min(1, n_iters)
        rem = n_iters - lead - n_snap * every

        def chunk(c, _):
            c, traces = jax.lax.scan(step, c, None, length=every)
            x = c[0]
            rec = dec(params["gen"], enc(params["enc"], avg_pool(x, factor)))
            return c, (traces, dict(adv_input=x, rec=rec))

        carry, head = jax.lax.scan(step, carry, None, length=lead)
        carry, (trace, snaps) = jax.lax.scan(chunk, carry, None, length=n_snap)
        trace = jax.tree.map(
            lambda t: t.reshape((n_snap * every,) + t.shape[2:]), trace)
        trace = jax.tree.map(lambda a, b: jnp.concatenate([a, b]), head, trace)
        if rem:
            carry, tail = jax.lax.scan(step, carry, None, length=rem)
            trace = jax.tree.map(
                lambda a, b: jnp.concatenate([a, b]), trace, tail)
        return carry[0], trace, snaps

    params = _model_params(pipeline)

    def attack(img, target_img):
        return attack_impl(params, img, target_img)

    attack.jitted = attack_impl
    return attack


def make_whitebox_stepper(pipeline: FusionPipeline, config: WhiteboxConfig):
    """Stepwise variant: ONE jitted optimisation step + a host loop.

    JAX dispatch is asynchronous, so the host loop still pipelines steps
    back-to-back on device; only the final fetch blocks.

    Returns ``(init, step)``: ``state = init(img, target)``,
    ``state, terms = step(state)``; the adversarial image is ``state["x"]``.
    """
    loss_fn = _make_loss(pipeline, config.weights)
    ref_fn = _make_ref(pipeline)
    opt_init, opt_apply = _pixel_opt(config.lr)

    @jax.jit
    def init_impl(params, img, target_img):
        return dict(
            x=img,
            ref=ref_fn(params, img, target_img),
            opt_state=opt_init(img),
        )

    # donate the state: without it every step copies the 1024^2 pixel buffer
    # + Adam moments (~0.5 GB at batch-8) instead of aliasing in place
    @functools.partial(jax.jit, donate_argnums=(1,))
    def step_impl(params, state):
        (loss, terms), g = jax.value_and_grad(loss_fn, argnums=1, has_aux=True)(
            params, state["x"], state["ref"]
        )
        x, opt_state = opt_apply(g, state["x"], state["opt_state"])
        terms["total"] = loss
        return dict(state, x=x, opt_state=opt_state), terms

    params = _model_params(pipeline)
    init = lambda img, target: init_impl(params, img, target)
    step = lambda state: step_impl(params, state)
    init.jitted, step.jitted = init_impl, step_impl
    return init, step


def run_whitebox_stepwise(pipeline: FusionPipeline, img, target_img,
                          config: WhiteboxConfig):
    """Host-looped white-box attack (same semantics as
    ``make_whitebox_attack``; smaller compiled unit)."""
    if config.grad_accum > 1:
        raise ValueError(
            "grad_accum > 1 is only supported by the vmapped stepwise "
            "executor (vmap_whitebox_stepwise): this naturally-batched path "
            "averages the loss over the batch, so chunking would change the "
            "gradient scale")
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
    params = _model_params(pipeline)

    batched = jax.vmap(
        lambda p, img, tgt: single.jitted(p, img[None], tgt[None]),
        in_axes=(None, 0, 0),
    )

    @jax.jit
    def attack_impl(p, imgs, targets):
        if targets.shape[0] == 1:
            targets = jnp.broadcast_to(targets, imgs.shape)
        if config.snapshot_every:
            advs, traces, snaps = batched(p, imgs, targets)
            # (B, K, 1, H, W, C) -> (K, B, H, W, C)
            snaps = jax.tree.map(
                lambda s: jnp.swapaxes(s[:, :, 0], 0, 1), snaps)
            return advs[:, 0], traces, snaps
        advs, traces = batched(p, imgs, targets)
        return advs[:, 0], traces

    def attack(imgs, targets):
        return attack_impl(params, imgs, targets)

    attack.jitted = attack_impl
    return attack


def vmap_whitebox_stepwise(pipeline: FusionPipeline, config: WhiteboxConfig):
    """Per-image (vmapped) stepwise attack: one vmapped single-image step
    program + an async host loop — exact per-image Adam trajectories like
    ``vmap_whitebox`` but with a small compiled unit.  Snapshots (when
    ``config.snapshot_every`` is set) are streamed to host numpy arrays, so
    this is the bounded-device-memory execution for snapshot runs."""
    init, step = make_whitebox_stepper(pipeline, config)
    params = _model_params(pipeline)

    vinit = jax.jit(jax.vmap(
        lambda p, img, tgt: init.jitted(p, img[None], tgt[None]),
        in_axes=(None, 0, 0),
    ))
    # re-declare donation on the OUTER jit: the inner step_impl's
    # donate_argnums does not survive inlining into this program, and
    # without it every vmapped step copies the full attack state
    # (~0.5 GB/step pixel buffer + Adam moments at 1024^2 batch-8)
    vstep = jax.jit(jax.vmap(step.jitted, in_axes=(None, 0)),
                    donate_argnums=(1,))
    every = config.snapshot_every
    if every:
        enc, dec, factor = (pipeline.encode_fn(), pipeline.decode_fn(),
                            pipeline.pool_factor)
        rec_of = jax.jit(lambda p, x: dec(
            p["gen"], enc(p["enc"], avg_pool(x, factor))))

    def attack(imgs, targets):
        if targets.shape[0] == 1:
            targets = jnp.broadcast_to(targets, imgs.shape)
        accum = max(int(config.grad_accum or 1), 1)
        b = imgs.shape[0]
        # pad-by-wrap to a chunk multiple (same convention as
        # parallel/sharding.py): per-image trajectories are independent, so
        # the wrapped rows are redundant compute that is sliced off below
        cb = -(-b // accum)
        if cb * accum != b:
            wrap = jnp.arange(cb * accum) % b
            imgs, targets = imgs[wrap], targets[wrap]
        cuts = [slice(i * cb, (i + 1) * cb) for i in range(accum)]
        # per-chunk states: the full batch's pixels + Adam moments stay
        # resident, but only ONE chunk's fwd/bwd activations are live at a
        # time — and every chunk reuses the same compiled step program
        states = [vinit(params, imgs[s], targets[s]) for s in cuts]
        traces, snaps = [], []
        for it in range(config.n_iters):
            step_terms = []
            for ci in range(accum):
                states[ci], terms = vstep(params, states[ci])
                step_terms.append(terms)
            traces.append(step_terms[0] if accum == 1 else jax.tree.map(
                lambda *xs: jnp.concatenate(xs), *step_terms))
            # reference cadence (`attack_main2.py:657`): post-step check at
            # loop index `it`, skipping the k=0 frame and the final iter
            if every and it % every == 0 and it // every > 0:
                # fetch each frame to HOST as it is produced (the reference
                # streams save_img PNGs, `attack_main2.py:657-661`): device
                # memory stays bounded by the live state, not by
                # n_snap × batch × image — at 1024² batch-8 every-5/100-iter
                # that is ~3.8 GB of f32 frames the scan path must carry.
                # rec runs per chunk so the snapshot synthesis never exceeds
                # the chunk activation footprint either.
                snaps.append(dict(
                    adv_input=np.concatenate([
                        np.asarray(st["x"][:, 0], np.float32)
                        for st in states])[:b],
                    rec=np.concatenate([
                        np.asarray(rec_of(params, st["x"][:, 0]), np.float32)
                        for st in states])[:b]))
        trace = jax.tree.map(
            lambda *xs: jnp.stack(xs, axis=1)[:b], *traces)
        adv = jnp.concatenate([st["x"][:, 0] for st in states])[:b]
        if every:
            if not snaps:  # n_iters <= every: the reference emits no frames
                empty = np.zeros((0, b) + imgs.shape[1:], np.float32)
                return adv, trace, dict(adv_input=empty, rec=empty)
            return adv, trace, jax.tree.map(lambda *xs: np.stack(xs), *snaps)
        return adv, trace

    return attack


def _sum_mse(a, b):
    """``nn.MSELoss(reduction='sum')`` — the LEGACY variants use sum, not
    mean (`attack_main2.py:684`)."""
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    return jnp.sum(d * d)


@dataclasses.dataclass(frozen=True)
class LegacyOptimizeConfig:
    """Reference ``optimize``/``optimize_copy`` (`attack_main2.py:674-762`):
    Adam(lr=0.01) for 1000 iters on the pixels, LPIPS-net perceptual term,
    sum-reduction MSEs, input snapshot appended every 50 iters."""

    lr: float = 0.01
    n_iters: int = 1000
    variant: str = "optimize"  # or "optimize_copy"
    snapshot_every: int = 50


def make_legacy_optimize(pipeline: FusionPipeline, lpips_model, lpips_vars,
                         config: LegacyOptimizeConfig):
    """Build the legacy LPIPS-net white-box optimizer — VERDICT r3 ask #9.

    Loss (``optimize``, `attack_main2.py:697-708`):
        sumMSE(img_org, x) + LPIPS(pool(target), pool(dec(enc(pool(x)))))
      + sumMSE(latent_target, enc(pool(x))) + sumMSE(target, dec(...))
    ``optimize_copy`` (`:723-753`) scores LPIPS at FULL resolution and the
    reconstruction against the target's own reconstruction ``target_rec``.

    Returns ``attack(img, target_img) -> (adv, trace, snapshots)`` where
    ``snapshots`` matches the reference's ``optimize.png`` rows exactly
    (`:689,714-718`): the ORIGINAL image first, then one frame per loop
    index ``k*snapshot_every`` for k >= 1 (the post-step save check, so
    frame k lands after k*every + 1 steps and the final iter never
    snapshots) — leading axis ``1 + (n_iters-1)//snapshot_every``;
    zero-length when ``snapshot_every`` is 0/None.  The whole loop runs as
    nested ``lax.scan``s (outer = snapshot cadence), so snapshots come out
    of ONE compiled program instead of 20 host syncs.
    """
    if config.variant not in ("optimize", "optimize_copy"):
        raise ValueError(f"unknown legacy variant {config.variant!r}")
    enc = pipeline.encode_fn()
    dec = pipeline.decode_fn()
    factor = pipeline.pool_factor
    opt = optax.adam(config.lr)
    copy_variant = config.variant == "optimize_copy"
    # snapshot_every=0/None disables snapshots (mirrors WhiteboxConfig):
    # one chunk of all iters, zero-length snapshot axis.  With snapshots
    # on, the reference cadence (`attack_main2.py:714`) is a post-step
    # check at loop index k*every: 1 lead step, (n_iters-1)//every chunks,
    # remainder — frame k after k*every + 1 steps, never the final iter.
    every = int(config.snapshot_every or 0)
    if every:
        n_snap = max((config.n_iters - 1) // every, 0)
        lead = min(1, config.n_iters)
        rem = config.n_iters - lead - n_snap * every
    else:
        n_snap, lead, rem = 0, 0, config.n_iters

    def loss_fn(params, x, ref):
        r_x = avg_pool(x, factor)
        latent_pred = enc(params["enc"], r_x)
        img_rec = dec(params["gen"], latent_pred)
        if copy_variant:
            l_lpips = lpips_model.apply(params["lpips"], ref["target"],
                                        img_rec)
            l_img_rec = _sum_mse(ref["target_rec"], img_rec)
        else:
            l_lpips = lpips_model.apply(params["lpips"], ref["r_target"],
                                        avg_pool(img_rec, factor))
            l_img_rec = _sum_mse(ref["target"], img_rec)
        terms = dict(
            img_org=_sum_mse(ref["img_org"], x),
            lpips_rec=jnp.sum(l_lpips),
            latent=_sum_mse(ref["latent_target"], latent_pred),
            img_rec=l_img_rec,
        )
        return sum(terms.values()), terms

    @jax.jit
    def attack_impl(params, img, target_img):
        r_t = avg_pool(target_img, factor)
        latent_target = enc(params["enc"], r_t)
        ref = jax.lax.stop_gradient(dict(
            img_org=img, target=target_img, r_target=r_t,
            latent_target=latent_target,
            target_rec=dec(params["gen"], latent_target),
        ))

        def step(carry, _):
            x, opt_state = carry
            (loss, terms), g = jax.value_and_grad(
                loss_fn, argnums=1, has_aux=True)(params, x, ref)
            updates, opt_state = opt.update(g, opt_state)
            x = optax.apply_updates(x, updates)
            terms["total"] = loss
            return (x, opt_state), terms

        def chunk(carry, _):
            carry, traces = jax.lax.scan(step, carry, None, length=every)
            return carry, (carry[0], traces)

        carry = (img, opt.init(img))
        carry, head = jax.lax.scan(step, carry, None, length=lead)
        carry, (snaps, traces) = jax.lax.scan(
            chunk, carry, None, length=n_snap)
        traces = jax.tree.map(
            lambda t: t.reshape((n_snap * every,) + t.shape[2:]), traces)
        traces = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b]), head, traces)
        if rem:
            carry, tail = jax.lax.scan(step, carry, None, length=rem)
            traces = jax.tree.map(
                lambda a, b: jnp.concatenate([a, b]), traces, tail)
        if every:
            # reference `optimize` seeds the montage with the ORIGINAL
            # image (`attack_main2.py:689`) before appending frames
            snaps = jnp.concatenate([img[None], snaps])
        return carry[0], traces, snaps

    params = dict(_model_params(pipeline), lpips=lpips_vars)

    def attack(img, target_img):
        return attack_impl(params, img, target_img)

    attack.jitted = attack_impl
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
    Returns ``(adv_inputs, traces)`` — or ``(adv_inputs, traces, snaps)``
    when ``config.snapshot_every`` is set (snaps leading dim = snapshot
    index, rows = the attacked subset in ``which_adv`` order)."""
    n = inputs.shape[0]
    which = sorted(set(range(n)) if not which_adv else set(which_adv))
    if config.execution == "stepwise":
        attack = vmap_whitebox_stepwise(pipeline, config)
    else:
        attack = vmap_whitebox(pipeline, config)
    # only optimise the selected rows (the reference optimises exactly the
    # chosen indices; attacking all n and masking would waste n/len(which)x)
    idx = jnp.asarray(which)
    sub_targets = target_img if target_img.shape[0] == 1 else target_img[idx]
    out = attack(inputs[idx], sub_targets)
    if config.snapshot_every:
        advs_sel, traces, snaps = out
        return inputs.at[idx].set(advs_sel), traces, snaps
    advs_sel, traces = out
    return inputs.at[idx].set(advs_sel), traces
