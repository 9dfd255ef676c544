"""Mesh + sharding rules — SURVEY §2 P1/P2/P3 (new components; the reference
is strictly single-GPU, `attack_main2.py:843`).

Axes:
- ``data``: batch axis of image batches — the attack loops are
  embarrassingly batch-parallel (each image optimises independently), so DP
  is the primary scaling axis; XLA emits the (only needed) collectives for
  metric reductions over ICI.
- ``model``: tensor-parallel axis for the generator's widest layers (style
  MLPs and low-resolution conv channels).  At 1024^2 a single v5e chip fits
  the whole model (SURVEY P3), so TP is optional head-room, expressed purely
  as weight shardings — GSPMD propagates and inserts all_gathers.

No hand-written communication: shardings in, XLA collectives out (P2).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    devices: Optional[Sequence] = None,
    *,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Build a ('data','model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n < model:
        raise ValueError(
            f"requested model={model} tensor-parallel shards but only {n} "
            f"device(s) are available ({[d.platform for d in devices]}); "
            "force a virtual CPU backend with "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N to test "
            "multi-device meshes on one host"
        )
    if data is None:
        data = n // model
    if data < 1 or data * model != n:
        raise ValueError(
            f"cannot build a data={data} x model={model} mesh from {n} "
            f"device(s): axis product {data * model} != device count {n}"
        )
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def pad_batch_to_multiple(x, multiple: int):
    """Pad the leading axis up to a multiple by wrapping rows from the
    start; returns ``(padded, n_real)``.  Sharded steps need an evenly
    divisible batch; the wrapped rows are real inputs (not zeros) so every
    model forward sees in-distribution data, and callers slice ``[:n_real]``
    afterwards.  The reference's loops (e.g. the ``max_num_fusion`` group
    loop, `interpolation.py:1265`) have no divisibility constraint — this
    keeps the DP paths free of one too."""
    import jax.numpy as jnp

    n = x.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    reps = -(-rem // n)  # wrap as many times as needed for tiny batches
    pad = jnp.concatenate([x] * reps, axis=0)[:rem]
    return jnp.concatenate([x, pad], axis=0), n


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def expected_tp_leaf_count(generator, model_size: int) -> int:
    """How many generator leaves the TP rule MUST shard, derived from the
    module's static structure (``conv_plan``/``n_mlp``) — independent of leaf
    names, so :func:`shard_generator_params` can be verified post-hoc."""
    n = 0
    # mapping MLP kernels: (style_dim, style_dim)
    if generator.style_dim % model_size == 0:
        n += generator.n_mlp
    # per-conv affine kernels: (style_dim, cin)
    n += sum(1 for cin in generator.style_input_dims()
             if cin % model_size == 0 and cin > 4)
    # modulated conv weights: (k, k, cin, cout); to_rgb (cout=3) replicated
    n += sum(1 for _, cout, kind in generator.conv_plan()
             if kind != "rgb" and cout % model_size == 0 and cout > 4)
    return n


def shard_generator_params(variables, mesh: Mesh, generator=None):
    """TP rule: shard the out-features of linear kernels (mapping + style
    affines) and the out-channels of synthesis conv weights over ``model``;
    replicate the rest.  Returns the variables placed with NamedShardings.

    The predicate is *structural* (leaf rank + shape), not name-based, so a
    renamed module cannot silently degrade to replication:

    - rank-2 leaves with out-features divisible by the axis are the linear
      kernels (the generator's only 2-D params; biases are 1-D);
    - rank-4 leaves shaped like square 1x1/3x3 conv kernels with divisible
      out-channels are the modulated convs (the (1, 4, 4, C) input constant
      and (1, R, R, 1) noise buffers fail the square-kernel test; to_rgb's
      cout=3 fails divisibility).

    When ``generator`` (the flax module) is passed, the actually-sharded
    leaf count is checked against :func:`expected_tp_leaf_count` derived
    from the module's static plan, failing loudly if the rule ever stops
    matching the parameter tree.
    """

    model_size = mesh.shape["model"]
    sharded_paths = []

    def spec_for(path, leaf):
        if (leaf.ndim == 2 and leaf.shape[1] % model_size == 0
                and leaf.shape[1] > 4):
            sharded_paths.append(path)
            return P(None, "model")
        if (leaf.ndim == 4 and leaf.shape[0] == leaf.shape[1]
                and leaf.shape[0] in (1, 3)
                and leaf.shape[3] % model_size == 0 and leaf.shape[3] > 4):
            sharded_paths.append(path)
            return P(None, None, None, "model")
        return P()

    placed = jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(leaf, NamedSharding(mesh, spec_for(path, leaf))),
        variables,
    )
    if generator is not None and model_size > 1:
        expected = expected_tp_leaf_count(generator, model_size)
        if len(sharded_paths) != expected:
            names = ["/".join(str(p.key) if hasattr(p, "key") else str(p)
                              for p in path) for path in sharded_paths]
            raise ValueError(
                f"TP sharding rule matched {len(sharded_paths)} generator "
                f"leaves but the module's static plan expects {expected} "
                f"(model={model_size}); matched: {sorted(names)}")
    return placed


def make_sharded_whitebox_step(pipeline, config, mesh: Mesh):
    """One data-parallel white-box optimisation step over the mesh.

    The full training step of this framework *is* the attack step (SURVEY
    §3.3): encoder fwd + decoder fwd + 2x VGG fwd + backward + Adam update on
    the pixel buffer.  Batch axis sharded over ``data``; params replicated
    (or TP-sharded via ``shard_generator_params``).

    Returns ``(step, init)`` where ``init(imgs, targets) -> state`` and
    ``step(state) -> (state, per_image_loss)`` — the loss comes back as a
    (B,) vector (every term per image, incl. the perceptual ones) so
    callers can slice padded rows off and log honest per-image
    trajectories; both jitted with explicit shardings.
    """
    import jax.numpy as jnp
    import optax

    from tpufusion.core.imaging import avg_pool
    from tpufusion.eval.metrics import perceptual_distance_per_image

    w = config.weights
    enc = pipeline.encode_fn()
    dec = pipeline.decode_fn()
    vgg = pipeline.vgg_fn()
    # model params are jit ARGUMENTS (never closure constants — captured flax
    # variables bloat the lowered HLO by the full param bytes)
    model_params = dict(
        enc=pipeline.enc_vars, gen=pipeline.drawer.gen_vars, vgg=pipeline.vgg_vars,
    )
    factor = pipeline.pool_factor
    opt = optax.adam(config.lr)

    # per-sample MSE (the shared eval.metrics definition); summed per image
    # -> same grads as per-image Adam up to lr scaling
    from tpufusion.eval.metrics import mse_per_image as mse_b

    def loss_fn(params, x, img_org, target_img, latent_org, latent_target,
                feats_org, feats_target):
        r_x = avg_pool(x, factor)
        latent_pred = enc(params["enc"], r_x)
        img_rec = dec(params["gen"], latent_pred)
        feats_x = vgg(params["vgg"], r_x)
        per = (
            w.latent_target * mse_b(latent_target, latent_pred)
            + w.latent_org * mse_b(latent_org, latent_pred)
            + w.img_rec_target * mse_b(target_img, img_rec)
            + w.img_rec_org * mse_b(img_org, img_rec)
            + w.img_org * mse_b(img_org, x)
        )
        if w.lpips_img != 0.0:
            per = per + w.lpips_img * perceptual_distance_per_image(
                feats_x, feats_org)
        if w.lpips_rec_target != 0.0 or w.lpips_rec_org != 0.0:
            feats_rec = vgg(params["vgg"], avg_pool(img_rec, factor))
            if w.lpips_rec_target != 0.0:
                per = per + w.lpips_rec_target * perceptual_distance_per_image(
                    feats_rec, feats_target)
            if w.lpips_rec_org != 0.0:
                per = per + w.lpips_rec_org * perceptual_distance_per_image(
                    feats_rec, feats_org)
        return jnp.sum(per), per

    bspec = lambda nd: NamedSharding(mesh, P("data", *([None] * (nd - 1))))

    @jax.jit
    def init_impl(params, imgs, targets):
        r_org = avg_pool(imgs, factor)
        r_t = avg_pool(targets, factor)
        return dict(
            x=imgs,
            img_org=imgs,
            target=targets,
            latent_org=enc(params["enc"], r_org),
            latent_target=enc(params["enc"], r_t),
            feats_org=vgg(params["vgg"], r_org),
            feats_target=vgg(params["vgg"], r_t),
            opt_state=opt.init(imgs),
        )

    @functools.partial(jax.jit, donate_argnums=(1,))  # alias state in place
    def step_impl(params, state):
        x = state["x"]
        (_, per), g = jax.value_and_grad(loss_fn, argnums=1, has_aux=True)(
            params, x, state["img_org"], state["target"], state["latent_org"],
            state["latent_target"], state["feats_org"], state["feats_target"],
        )
        updates, opt_state = opt.update(g, state["opt_state"])
        x = optax.apply_updates(x, updates)
        new_state = dict(state, x=x, opt_state=opt_state)
        return new_state, per

    init = lambda imgs, targets: init_impl(model_params, imgs, targets)
    step = lambda state: step_impl(model_params, state)
    init.jitted, step.jitted = init_impl, step_impl

    def place_batch(imgs, targets):
        imgs = jax.device_put(imgs, bspec(imgs.ndim))
        targets = jax.device_put(targets, bspec(targets.ndim))
        return imgs, targets

    return step, init, place_batch


def make_sharded_patch_train_step(pipeline, config, mesh: Mesh):
    """Batch-synchronous data-parallel adversarial-patch training step.

    The reference trains the patch strictly sequentially — one image at a
    time, gradient descent on the pasted canvas, patch re-extracted per batch
    (`adversarial_patch.py:94-160`).  The DP generalisation is the classic
    shared-parameter training pattern this workload otherwise lacks: the
    image batch is sharded over ``data``, each image gets its own random
    placement (vmapped transform, per-image key), the loss is averaged over
    the batch, and the PATCH gradient — obtained by differentiating through
    the placement transform instead of canvas-space GD — comes back as one
    replicated update (XLA inserts the psum over ICI).

    Semantics per step (mirroring the reference inner loop `:111-158`):
    ``max_count`` scanned iterations on a fixed set of placements, raw
    gradient descent ``patch -= step_size * grad``, clamp to the batch's
    pixel range (`:138`).

    Returns ``(step, place_batch)``; ``step(imgs, patch, key,
    row_weights=None) -> (patch', loss_trace)`` with ``imgs`` data-sharded
    and ``patch`` replicated.  ``row_weights`` (B,) masks rows out of the
    shared-patch gradient — padded/wrapped rows MUST be zero-weighted or
    they double-count in the weighted mean (``None`` = all ones).
    """
    import jax.numpy as jnp

    from tpufusion.attacks.patch import circle_transform, square_transform
    from tpufusion.core.imaging import avg_pool
    from tpufusion.eval.metrics import mse_per_image

    cfg = config
    enc = pipeline.encode_fn()
    model_params = dict(enc=pipeline.enc_vars)
    factor = pipeline.pool_factor
    size = pipeline.image_size
    transform = square_transform if cfg.patch_type == "square" else circle_transform

    @jax.jit
    def step_impl(params, imgs, patch, key, row_weights):
        n = imgs.shape[0]
        keys = jax.random.split(key, n)  # one placement per image, fixed
        latent_org = jax.lax.stop_gradient(
            enc(params["enc"], avg_pool(imgs, factor)))
        cmin, cmax = jnp.min(imgs), jnp.max(imgs)
        wsum = jnp.sum(row_weights)

        def loss_fn(patch_):
            canvases, masks, _ = jax.vmap(
                transform, in_axes=(None, None, 0))(patch_, size, keys)
            adv = (1.0 - masks) * imgs + masks * canvases
            adv_latent = enc(params["enc"], avg_pool(adv, factor))
            # weighted mean of per-image losses: padded rows carry weight 0
            per = mse_per_image(latent_org, adv_latent)
            return cfg.w_latent_org * jnp.sum(row_weights * per) / wsum

        grad_fn = jax.value_and_grad(loss_fn)

        def inner(patch_, _):
            loss, g = grad_fn(patch_)
            patch_ = jnp.clip(patch_ - cfg.step_size * g, cmin, cmax)
            return patch_, loss

        return jax.lax.scan(inner, patch, None, length=cfg.max_count)

    def step(imgs, patch, key, row_weights=None):
        if row_weights is None:
            row_weights = jnp.ones((imgs.shape[0],), jnp.float32)
        return step_impl(model_params, imgs, patch, key, row_weights)

    step.jitted = step_impl

    def place_batch(imgs, patch, row_weights=None):
        placed = (
            jax.device_put(imgs, batch_sharding(mesh, imgs.ndim)),
            jax.device_put(patch, replicate(mesh)),
        )
        if row_weights is None:
            return placed
        return placed + (
            jax.device_put(row_weights, batch_sharding(mesh, 1)),)

    return step, place_batch


def prepare_whitebox_batch(inputs, target_img, which_adv, mesh: Mesh):
    """Shared preamble of the driver-level sharded whitebox runners:
    which_adv selection, per-image/shared target resolution, pad to the
    ``data`` axis.  Returns ``(idx, sub_p, targets_p, n_real)``."""
    import jax.numpy as jnp

    n = inputs.shape[0]
    which = sorted(set(range(n)) if not which_adv else set(which_adv))
    idx = jnp.asarray(which)
    sub = inputs[idx]
    # per-image targets select the same rows (white_box_patch paste targets);
    # a single shared target broadcasts across the selection
    targets = (jnp.broadcast_to(target_img, sub.shape)
               if target_img.shape[0] == 1 else target_img[idx])
    data = mesh.shape["data"]
    sub_p, n_real = pad_batch_to_multiple(sub, data)
    targets_p, _ = pad_batch_to_multiple(targets, data)
    return idx, sub_p, targets_p, n_real


def run_whitebox_sharded(pipeline, inputs, target_img, config, which_adv,
                         mesh: Mesh):
    """Driver-level DP white-box attack: the semantics of
    ``attacks.whitebox.run_whitebox`` (`attack_main2.py:465-498`) executed
    through :func:`make_sharded_whitebox_step` — the selected images are
    batched, padded to the ``data`` axis (per-image optimisation is
    independent, so the wrapped pad rows cannot perturb real rows), and every
    step runs as one sharded program across the mesh.

    Returns ``(adv_inputs, loss_trace)``; the trace is (n_selected, iters)
    — per-image trajectories with padded rows sliced off
    (``per_image_iter`` log kind, same contract as the single-device
    ``run_whitebox``)."""
    import jax.numpy as jnp

    idx, sub_p, targets_p, n_real = prepare_whitebox_batch(
        inputs, target_img, which_adv, mesh)

    step, init, place_batch = make_sharded_whitebox_step(pipeline, config, mesh)
    imgs, tgts = place_batch(sub_p, targets_p)
    losses = []
    with mesh:
        state = init(imgs, tgts)
        for _ in range(config.n_iters):
            state, per = step(state)
            losses.append(per)
    adv_sel = state["x"][:n_real]
    trace = jnp.stack(losses, axis=1)[:n_real]  # (n_selected, iters)
    return inputs.at[idx].set(adv_sel), trace


def train_patch_sharded(pipeline, images, key, config, mesh: Mesh,
                        target_img=None, log_fn=None):
    """DP patch training: the DP generalisation of ``attacks.patch.
    train_patch`` (`adversarial_patch.py:94-160`) — per epoch, the whole
    train set forms ONE ``data``-sharded batch and the patch update is the
    psum-averaged gradient over all placements (batch-synchronous, vs the
    reference's strictly sequential per-image loop).  Returns the same
    ``(canvas, mask)`` pair as ``train_patch``.

    ``target_img`` is accepted for signature parity with ``train_patch``;
    the loss is the encoder-drift objective (`adversarial_patch.py:126`),
    which does not use it.
    """
    import jax.numpy as jnp
    import numpy as np

    from tpufusion.attacks.patch import (
        canonical_canvas,
        init_patch_circle,
        init_patch_square,
    )

    cfg = config
    init = init_patch_square if cfg.patch_type == "square" else init_patch_circle
    key, kinit = jax.random.split(key)
    patch = init(pipeline.image_size, cfg.patch_frac, kinit)

    imgs = jnp.concatenate([jnp.asarray(im) for im in images], axis=0)
    imgs, n_real = pad_batch_to_multiple(imgs, mesh.shape["data"])
    # wrapped pad rows are zero-weighted out of the shared-patch gradient —
    # otherwise the duplicated images double-count in the weighted mean
    row_weights = (jnp.arange(imgs.shape[0]) < n_real).astype(jnp.float32)

    step, place_batch = make_sharded_patch_train_step(pipeline, cfg, mesh)
    for epoch in range(cfg.epochs):
        key, k = jax.random.split(key)
        s_imgs, s_patch, s_w = place_batch(imgs, patch, row_weights)
        with mesh:
            patch, trace = step(s_imgs, s_patch, k, s_w)
        if log_fn is not None:
            log_fn(epoch, 0, np.asarray(trace))
    return canonical_canvas(patch, pipeline.image_size, cfg.patch_type)


def make_sharded_group_fusion_attack(pipeline, config, mesh: Mesh):
    """Fusion-aware PGD over G independent fusion GROUPS, sharded over the
    mesh.

    Within one (N, S, S, 3) group the N inputs couple through the fused
    image, so the batch axis of `attacks.fusion_attack` cannot be
    data-parallelised.  The scalable axis is groups: the reference evaluates
    them strictly sequentially (``max_num_fusion`` loop,
    `interpolation.py:1265`); here the whole attack is vmapped over the
    group axis and that axis sharded over ``data`` — G complete
    encoder→blend→synthesis PGD loops run concurrently across the chips.

    Returns ``attack(groups (G,N,S,S,3), targets (G|1,1,S,S,3), key) ->
    (adv (G,N,S,S,3), traces (G, steps))``.
    """
    import jax.numpy as jnp

    from tpufusion.attacks.fusion_attack import make_fusion_attack

    single = make_fusion_attack(pipeline, config)
    params = dict(
        enc=pipeline.enc_vars,
        gen=pipeline.drawer.gen_vars,
        blend=pipeline.drawer.blend_params,
        vgg=pipeline.vgg_vars,
    )

    vattack = jax.vmap(
        lambda p, g, t, k: single.jitted(g, k, p, t),
        in_axes=(None, 0, 0, 0),
    )

    @jax.jit
    def attack_impl(p, groups, targets, keys):
        if targets.shape[0] == 1:
            targets = jnp.broadcast_to(
                targets, (groups.shape[0],) + targets.shape[1:])
        return vattack(p, groups, targets, keys)

    def attack(groups, targets, key):
        g, data = groups.shape[0], mesh.shape["data"]
        # non-divisible group counts pad-and-slice (wrapped real groups, so
        # the extra lanes run in-distribution); results keep the caller's G
        groups, n_real = pad_batch_to_multiple(groups, data)
        if targets.shape[0] not in (1, groups.shape[0]):
            targets, _ = pad_batch_to_multiple(targets, data)
        keys = jax.random.split(key, groups.shape[0])
        groups = jax.device_put(groups, batch_sharding(mesh, groups.ndim))
        keys = jax.device_put(keys, batch_sharding(mesh, keys.ndim))
        with mesh:
            adv, traces = attack_impl(params, groups, targets, keys)
        if n_real != groups.shape[0]:
            adv, traces = adv[:n_real], jax.tree.map(
                lambda t: t[:n_real], traces)
        return adv, traces

    attack.jitted = attack_impl
    return attack


def _place_loss_args(args, args_spec, mesh: Mesh):
    """Place per-image ('batch') args sharded over ``data`` (padded to the
    axis) and everything else ('rep') replicated.  Returns the placed tuple."""
    placed = []
    for a, spec in zip(args, args_spec):
        if spec == "batch":
            a, _ = pad_batch_to_multiple(a, mesh.shape["data"])
            a = jax.device_put(a, batch_sharding(mesh, a.ndim))
        else:
            a = jax.device_put(a, replicate(mesh))
        placed.append(a)
    return tuple(placed)


def run_pgd_sharded(loss_fn, config, inputs, key, args, args_spec,
                    mesh: Mesh):
    """DP PGD/FGSM — VERDICT r3 ask #2 (the ``pgd``/``fgsm``/
    ``pgd_classifier`` dispatch branches, `runner.py`).

    PGD is embarrassingly batch-parallel (sign(grad) of a mean/sum loss is
    per-image), so the whole scan runs as ONE sharded program with the batch
    over ``data``.  The random start is drawn at the UNPADDED shape with the
    same key stream as ``attacks.pgd.make_pgd``, then the batch is padded by
    wrapping — per-image trajectories are exactly the single-device ones, so
    sharded == single holds bit-for-bit on the real rows.

    Args:
      loss_fn: ``loss_fn(adv, *args) -> scalar``.
      args/args_spec: the loss args and a parallel tuple of ``'batch'``
        (per-image: pad + shard) or ``'rep'`` (params: replicate).
    Returns ``(adv[:n], trace)``; the (steps,) trace is the sharded batch's
    mean/sum loss (includes wrapped pad rows — log-only).
    """
    from tpufusion.attacks.pgd import make_pgd, pgd_random_start

    data = mesh.shape["data"]
    start = pgd_random_start(inputs, key, config)
    inputs_p, n_real = pad_batch_to_multiple(inputs, data)
    start_p, _ = pad_batch_to_multiple(start, data)
    sh = batch_sharding(mesh, inputs_p.ndim)
    inputs_p = jax.device_put(inputs_p, sh)
    start_p = jax.device_put(start_p, sh)
    placed = _place_loss_args(args, args_spec, mesh)
    attack = make_pgd(loss_fn, config, external_start=True)
    with mesh:
        adv, trace = attack(inputs_p, start_p, *placed)
    return adv[:n_real], trace


def run_cw_sharded(logits_fn, config, inputs, labels, args, args_spec,
                   mesh: Mesh):
    """DP Carlini-Wagner — VERDICT r3 ask #2 (the ``cw`` dispatch branch).

    The CW cost is a SUM over the batch and Adam's moments are elementwise
    (`attacks/cw.py`), so per-image trajectories are independent of batch
    composition: padding by wrapping + sharding over ``data`` reproduces the
    single-device result exactly on the real rows.

    Returns ``(best_adv[:n], best_l2[:n])``.
    """
    from tpufusion.attacks.cw import make_cw

    data = mesh.shape["data"]
    inputs_p, n_real = pad_batch_to_multiple(inputs, data)
    labels_p, _ = pad_batch_to_multiple(labels, data)
    inputs_p = jax.device_put(inputs_p, batch_sharding(mesh, inputs_p.ndim))
    labels_p = jax.device_put(labels_p, batch_sharding(mesh, labels_p.ndim))
    placed = _place_loss_args(args, args_spec, mesh)
    attack = make_cw(logits_fn, config)
    with mesh:
        best_adv, best_l2 = attack(inputs_p, labels_p, *placed)
    return best_adv[:n_real], best_l2[:n_real]


def make_sharded_group_eval(pipeline, mesh: Mesh):
    """The EVALUATION phase (partial fusion both modes + metric table rows,
    `interpolation.py:1076-1091,1406-1415`) for G fusion groups as ONE
    sharded program — VERDICT r3 ask #2's second half.  The reference (and
    the single-device driver) evaluates groups serially; here the per-group
    eval is vmapped over the group axis and that axis sharded over ``data``,
    exactly like :func:`make_sharded_group_fusion_attack` does for the
    attack phase.

    Returns ``evaluate(groups (G,N,S,S,3), advs (G,N,S,S,3)) -> dict`` with
    per-group leading axes: ``noise (G,N)``, ``part_sp/part_ar
    (G,N+1,H,W,C)``, ``b_sp/b_ar (G,1,H,W,C)``, ``cri/vg/ssim_{sp,ar}
    (G,N+1)`` — the exact quantities ``runner.run_experiment``'s metric loop
    computes per batch.
    """
    import jax.numpy as jnp

    from tpufusion.core.imaging import avg_pool
    from tpufusion.eval.metrics import (
        fused_image_metrics_with,
        mse_per_image,
    )
    from tpufusion.eval.partial import partial_latent_variants
    from tpufusion.fusion.drawer import SWAP_TABLE
    from tpufusion.fusion.spatial import ROLE_MAPS

    enc = pipeline.encode_fn()
    gen = pipeline.generator
    vgg = pipeline.vgg_fn()
    factor = pipeline.pool_factor
    latent_avg = pipeline.latent_avg
    is_cars = pipeline.is_cars
    role_cfg = ROLE_MAPS[pipeline.dataset]
    roles = role_cfg["roles"]
    kwargs_map = role_cfg["kwargs"]  # {swap_kw: role}
    base_role = role_cfg["base"]
    # the same SWAP_TABLE-ordered signature drawer.generate_img would build
    provided = tuple(k for k, _ in SWAP_TABLE if k in kwargs_map)
    spatial_fn = pipeline.drawer._generate_fn("w", provided)
    params = dict(
        enc=pipeline.enc_vars,
        gen=pipeline.drawer.gen_vars,
        blend=pipeline.drawer.blend_params,
        vgg=pipeline.vgg_vars,
        mean=pipeline.drawer.mean_latent,
    )

    def latents_of(p, imgs):
        # the ONE latent definition (pipeline.latents_with), like the
        # shared fused_image_metrics_with below
        from tpufusion.pipeline import latents_with

        return latents_with(enc, p["enc"], latent_avg, factor,
                            is_cars, imgs)

    def spatial_of(p, variants):
        # variants (K, N, L, 512): each role's latent batched over K
        by_role = {r: variants[:, i] for i, r in enumerate(roles)}
        swaps = [by_role[kwargs_map[k]] for k in provided]
        return spatial_fn(p["gen"], p["blend"], p["mean"],
                          by_role[base_role], *swaps).image

    def arith_of(p, variants):
        means = jnp.mean(variants, axis=1)  # (K, L, 512)
        return gen.apply(p["gen"], [means], input_is_latent=True).image

    def metrics_of(p, benign_fused, fused_all):
        # the ONE metric definition, shared with the serial path
        # (`eval.metrics.fused_image_metrics`) so they cannot drift
        return fused_image_metrics_with(vgg, p["vgg"], factor,
                                        benign_fused, fused_all)

    def group_eval(p, inputs, adv):
        codes_b = latents_of(p, inputs)
        codes_a = latents_of(p, adv)
        variants = partial_latent_variants(codes_b, codes_a)
        benign = codes_b[None]  # (1, N, L, 512) "variant" = fully benign
        b_sp = spatial_of(p, benign)
        b_ar = arith_of(p, benign)
        part_sp = spatial_of(p, variants)
        part_ar = arith_of(p, variants)
        cri_sp, vg_sp, ss_sp = metrics_of(p, b_sp, part_sp)
        cri_ar, vg_ar, ss_ar = metrics_of(p, b_ar, part_ar)
        return dict(
            noise=mse_per_image(inputs, adv),
            b_sp=b_sp, b_ar=b_ar, part_sp=part_sp, part_ar=part_ar,
            cri_sp=cri_sp, cri_ar=cri_ar, vg_sp=vg_sp, vg_ar=vg_ar,
            ss_sp=ss_sp, ss_ar=ss_ar,
        )

    veval = jax.jit(jax.vmap(group_eval, in_axes=(None, 0, 0)))

    def evaluate(groups, advs):
        data = mesh.shape["data"]
        groups_p, n_real = pad_batch_to_multiple(groups, data)
        advs_p, _ = pad_batch_to_multiple(advs, data)
        groups_p = jax.device_put(groups_p, batch_sharding(mesh, groups_p.ndim))
        advs_p = jax.device_put(advs_p, batch_sharding(mesh, advs_p.ndim))
        with mesh:
            out = veval(params, groups_p, advs_p)
        return jax.tree.map(lambda t: t[:n_real], out)

    return evaluate
