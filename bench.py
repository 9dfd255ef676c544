"""Headline benchmark + hot-program submetrics.

BASELINE.json north star: ">= 100 PGD steps/sec on batch-8 1024^2 fusion on
one v5e chip".  One PGD step (reference semantics, `interpolation.py:74-94`
inline copy + torchattacks recipe `:1331-1365`): forward the attacked model
on the 1024^2 adversarial batch, backward to the pixels, fused
grad-sign + eps-projection + clamp update.  The attacked model is the
reference's transfer surrogate — a resnet18 gender-shaped classifier
(`interpolation.py:1299,1343`) — TRAINED here on an oriented-grating
texture task with label-independent global statistics, so the printed
"N/N flipped" and the reported margin drop measure attack success against
real decision boundaries (VERDICT r3 ask #3; held-out acc targets ~0.9,
not the margin-saturated 1.0 of a brightness rule), with the
avg-pool-to-256 preprocessing inside the differentiated graph.

The whole ``steps`` loop is ONE ``lax.scan`` in ONE jit — a single device
dispatch — so the number is pure device throughput.

Prints ONE JSON line; the headline fields are the driver contract and
``submetrics`` carries every other hot-program number so round-over-round
regressions are visible in BENCH_r{N}.json (VERDICT r2 weak #2):
- ``encoder_drift_pgd_steps_per_sec`` — full e4e-50 backward per step
- ``whitebox_steps_per_sec`` — enc + 1024^2 synthesis + VGG fwd/bwd + Adam
  (SURVEY §3.3, the reference's hottest loop)
- ``partial_fusion_sweep_ms`` — the (N+1)-variant spatial partial-fusion
  evaluation as one batched synthesis (`interpolation.py:978-1031`)
- ``patch_train_iters_per_sec`` — adversarial-patch inner iterations
  (`adversarial_patch.py:94-160`, the reference's costliest job)
- ``fusion_pgd_steps_per_sec`` — the fusion-aware PGD (BASELINE config 2):
  one step differentiates encoder -> mean-W+ -> FULL 1024^2 synthesis
- ``experiment_wall_s`` — ONE COMPLETE experiment at reference budgets
  (`attack_main2.py:990-1111`): whitebox at the reference's iteration
  budget on all N fusion inputs incl. save_img snapshots, both partial
  sweeps, metric table, artifact writes (BASELINE.md has the methodology)

Env knobs: BENCH_SIZE (1024), BENCH_BATCH (8), BENCH_STEPS (100),
BENCH_CALLS (3), BENCH_TINY=1 (CPU smoke), BENCH_SUBMETRICS=0 (headline
only), BENCH_EXPERIMENT=0 (skip the full-experiment wall),
BENCH_SKIP_PROBE=1 (trust the backend, skip the subprocess TPU probe),
BENCH_PROBE_TIMEOUT (300 s).

Failure contract (VERDICT r4 #1a): if the TPU backend is unreachable the
run degrades to a clearly-marked CPU-tiny pass (``tpu_unavailable: true``
in the JSON), and ANY unhandled exception still emits a parsable JSON
line — the process always exits 0 with one JSON line on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time


def log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


# Incrementally-populated partial result: if a later submetric crashes the
# process, the __main__ guard salvages the headline + every submetric that
# completed (the first on-hardware r5 run lost a measured 341-steps/s
# headline to a b2x OOM that struck AFTER it).
_PARTIAL: dict = {}


def tpu_alive(timeout_s: int = 300) -> bool:
    """Probe the TPU backend in a SUBPROCESS before the main process touches
    jax.  Tunnel failures HANG rather than error (the r4 outage: backend init
    blocked for hours), and a hung backend in THIS process can't be recovered
    — so the probe must be external and timeout-bounded.  Returns True only
    if a non-CPU backend round-trips a real computation within the budget."""
    import subprocess

    code = (
        "import jax, jax.numpy as jnp\n"
        "assert jax.default_backend() != 'cpu', 'no accelerator'\n"
        "print(float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum()))\n"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        log(f"TPU probe timed out after {timeout_s}s (tunnel hang)")
        return False
    if r.returncode != 0:
        tail = (r.stderr or "").strip().splitlines()[-1:] or ["<no stderr>"]
        log(f"TPU probe failed rc={r.returncode}: {tail[0]}")
        return False
    return True


def grating_batch(rng, n, size, rmax=0.9, contrast_lo=0.08, contrast_hi=0.35,
                  noise=0.35):
    """Relational oriented-grating texture task (VERDICT r3 weak #1 / ask
    #3): every sample carries a PRIMARY grating in the label's orientation
    (0 = horizontal, 1 = vertical; random frequency 2-8 cycles, phase,
    contrast) plus a DISTRACTOR grating in the other orientation at a
    random fraction (up to ``rmax``) of the primary's contrast, over
    uniform pixel noise.  Global statistics are label-independent and the
    rule is relational (which orientation is stronger), so the classifier
    must compare oriented frequency energies; samples with distractor
    ratio near 1 sit close to the decision boundary, giving real margins
    and a held-out accuracy near 0.9 — unlike the margin-saturated
    brightness rule benched in earlier rounds."""
    import numpy as np

    x = rng.uniform(-noise, noise, (n, size, size, 3)).astype(np.float32)
    t = (np.arange(size, dtype=np.float32) / size)[None, :]

    def wave(c):
        f = rng.uniform(2.0, 8.0, (n, 1))
        p = rng.uniform(0.0, 2.0 * np.pi, (n, 1))
        return (c * np.sin(2.0 * np.pi * f * t + p)).astype(np.float32)

    y = rng.randint(0, 2, n).astype(np.int32)
    c_p = rng.uniform(contrast_lo, contrast_hi, (n, 1))
    c_d = c_p * rng.uniform(0.0, max(rmax, 1e-9), (n, 1))
    wp, wd = wave(c_p), wave(c_d)
    xh = np.where(y[:, None] == 0, wp, wd)  # horizontal amplitude rows
    xv = np.where(y[:, None] == 1, wp, wd)
    x += xh[:, :, None, None] + xv[:, None, :, None]
    return np.clip(x, -1.0, 1.0), y


def train_synthetic_classifier(clf, clf_vars, clf_size, seed=7, steps=200):
    """Adam steps on the oriented-grating texture task so the benchmarked
    attack flips a classifier with genuine decision boundaries.

    Trains with a distractor-ratio CURRICULUM (first 40% of steps
    distractor-free, then the ratio cap ramps to 0.9): from-scratch
    training on the full relational task collapses to one class, but the
    single-orientation phase bootstraps the oriented features the
    comparison phase then sharpens (measured on the real chip: flat 0.69
    CE without the curriculum vs 0.89 held-out with it).

    Batches are generated with numpy on the host (eager per-op dispatch over
    the TPU tunnel is seconds per op) and the whole train loop is ONE scanned
    jit.  Returns (trained_vars, heldout_accuracy) — held out at FULL
    difficulty (rmax=0.9)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    rng = np.random.RandomState(seed)
    warm = max(int(steps * 0.4), 1)
    ramp = [0.0] * warm + list(np.linspace(0.0, 0.9, steps - warm))
    xs, ys = zip(*(grating_batch(rng, 16, clf_size, rmax=r) for r in ramp))
    xs, ys = jnp.asarray(np.stack(xs)), jnp.asarray(np.stack(ys))
    opt = optax.adam(1e-3)

    @jax.jit
    def train(vars_, xs, ys):
        def step(carry, xy):
            v, opt_state = carry
            x, y = xy

            def loss_fn(v_):
                logits = clf.apply(v_, x)
                return jnp.mean(
                    optax.softmax_cross_entropy_with_integer_labels(
                        logits.astype(jnp.float32), y))

            loss, g = jax.value_and_grad(loss_fn)(v)
            updates, opt_state = opt.update(g, opt_state, v)
            return (optax.apply_updates(v, updates), opt_state), loss

        (v, _), trace = jax.lax.scan(step, (vars_, opt.init(vars_)), (xs, ys))
        return v, trace

    clf_vars, _ = train(clf_vars, xs, ys)
    xh, yh = grating_batch(np.random.RandomState(seed + 92), 128, clf_size,
                           rmax=0.9)
    acc = float(jnp.mean((jnp.argmax(jax.jit(clf.apply)(
        clf_vars, jnp.asarray(xh)), -1) == jnp.asarray(yh)).astype(jnp.float32)))
    return clf_vars, acc


def main() -> int:
    tiny = os.environ.get("BENCH_TINY", "0") == "1"
    tpu_unavailable = False
    if not tiny and os.environ.get("BENCH_SKIP_PROBE", "0") != "1":
        # Backend-failure guard (VERDICT r4 #1a): if the tunnel is down the
        # round must still produce a parsable artifact, not a traceback —
        # degrade to a clearly-marked CPU-tiny run.
        if not tpu_alive(int(os.environ.get("BENCH_PROBE_TIMEOUT", "300"))):
            log("TPU unavailable — degrading to CPU-tiny run "
                "(tpu_unavailable=true in the JSON)")
            tiny = True
            tpu_unavailable = True
    size = int(os.environ.get("BENCH_SIZE", "32" if tiny else "1024"))
    batch = int(os.environ.get("BENCH_BATCH", "2" if tiny else "8"))
    steps = int(os.environ.get("BENCH_STEPS", "5" if tiny else "100"))
    calls = int(os.environ.get("BENCH_CALLS", "1" if tiny else "3"))
    submetrics_on = os.environ.get("BENCH_SUBMETRICS", "1") == "1"

    import jax

    if tiny:
        # CPU smoke: matches the test-suite backend (the tunnel TPU pays
        # 20-40 s compile per program — too slow for a smoke run)
        jax.config.update("jax_platforms", "cpu")

    cache_dir = os.environ.get(
        "JAX_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "tests/.jax_cache" if tiny else ".jax_cache_tpu"),
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import jax.numpy as jnp

    from tpufusion.attacks.pgd import PGDConfig, make_pgd
    from tpufusion.core.imaging import avg_pool
    from tpufusion.pipeline import FusionPipeline, create_test_pipeline

    submetrics: dict = {}

    log(f"backend={jax.default_backend()} size={size} batch={batch} "
        f"steps={steps} calls={calls}")
    t0 = time.time()
    if tiny:
        pipeline = create_test_pipeline("ffhq", jax.random.key(0), size=size)
    else:
        remat = os.environ.get("BENCH_REMAT", "0") == "1"
        pipeline = FusionPipeline.create(
            "ffhq", jax.random.key(0), size=size, remat=remat,
            mean_latent_samples=256,
        )
    log(f"pipeline built in {time.time() - t0:.1f}s")

    enc = pipeline.encode_fn()
    factor = pipeline.pool_factor

    imgs = jax.random.uniform(
        jax.random.key(1), (batch, size, size, 3), jnp.float32, -1, 1
    )

    # ---- primary: the reference's PGD recipe (`interpolation.py:1343`) —
    # classifier-gradient PGD against the resnet18 gender-model shape, on
    # full 1024^2 fusion inputs (resized to the classifier's 256^2 inside
    # the differentiated graph, as the reference's transforms do).
    from tpufusion.models.resnet import create_resnet18

    clf_size = min(size, 256)
    clf_factor = max(size // clf_size, 1)
    clf, clf_vars = create_resnet18(
        jax.random.key(5), num_classes=2,
        image_size=clf_size, policy=pipeline.policy,
    )
    t0 = time.time()
    clf_vars, train_acc = train_synthetic_classifier(clf, clf_vars, clf_size)
    log(f"classifier trained on oriented-grating texture task in "
        f"{time.time() - t0:.1f}s (held-out acc {train_acc:.2f}) — attack "
        f"success below is against these trained weights")
    submetrics["classifier_heldout_acc"] = round(train_acc, 4)

    predict = jax.jit(
        lambda v, x: jnp.argmax(clf.apply(v, avg_pool(x, clf_factor)), -1))

    def margin_fn(v, x, labels_):
        # per-image logit margin of the (predicted) label over the runner-up
        logits = clf.apply(v, avg_pool(x, clf_factor)).astype(jnp.float32)
        one_hot = jax.nn.one_hot(labels_, logits.shape[-1])
        real = jnp.sum(one_hot * logits, axis=-1)
        other = jnp.max(logits - one_hot * 1e9, axis=-1)
        return real - other

    margin = jax.jit(margin_fn)
    # attacked batch: in-distribution gratings at mid contrast — inside the
    # regime the classifier genuinely discriminates, so "flipped" and the
    # margin drop measure real attack success against real decision
    # boundaries (VERDICT r3 ask #3)
    import numpy as _np

    _rng = _np.random.RandomState(11)
    _x, _ = grating_batch(_rng, batch, size, rmax=0.9)
    clf_imgs = jnp.asarray(_x)
    labels = predict(clf_vars, clf_imgs)
    clean_margin = margin(clf_vars, clf_imgs, labels)

    # params + labels as loss args (closure-captured params would embed
    # the model as constants into the compile request)
    def ce_loss(adv, clf_params, labels_):
        logits = clf.apply(clf_params, avg_pool(adv, clf_factor))
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        return -jnp.mean(jnp.take_along_axis(logp, labels_[:, None], axis=-1))

    attack = make_pgd(
        ce_loss,
        PGDConfig(eps=16 / 255, alpha=0.01, steps=steps, random_start=True),
    )

    # NB: on the tunnel backend block_until_ready does not synchronize —
    # a scalar value fetch is the only reliable barrier.
    t0 = time.time()
    adv, trace = attack(clf_imgs, jax.random.key(2), clf_vars, labels)
    _ = float(trace[-1])
    log(f"pgd compile+warmup ({steps} steps) in {time.time() - t0:.1f}s")

    t0 = time.time()
    for c in range(calls):
        adv, trace = attack(
            clf_imgs, jax.random.fold_in(jax.random.key(3), c), clf_vars, labels,
        )
    ce = float(trace[-1])  # hard device fetch: forces all queued calls
    dt = time.time() - t0
    steps_per_sec = steps * calls / dt
    flipped = int(jnp.sum(predict(clf_vars, adv) != labels))
    adv_margin = margin(clf_vars, adv, labels)
    m_clean = float(jnp.mean(clean_margin))
    m_drop = float(jnp.mean(clean_margin - adv_margin))
    log(f"pgd: {calls}x{steps} steps in {dt:.2f}s "
        f"(final CE {ce:.4f}, {flipped}/{batch} flipped vs TRAINED "
        f"classifier; mean margin {m_clean:.3f} -> "
        f"{float(jnp.mean(adv_margin)):.3f}, drop {m_drop:.3f})")
    submetrics["classifier_pgd_steps_per_sec"] = round(steps_per_sec, 3)
    submetrics["classifier_pgd_flipped"] = f"{flipped}/{batch}"
    submetrics["classifier_clean_margin"] = round(m_clean, 4)
    submetrics["classifier_margin_drop"] = round(m_drop, 4)
    _PARTIAL.update({
        "metric": f"PGD attack steps/sec, batch-{batch}, {size}^2 fusion inputs",
        "value": round(steps_per_sec, 3),
        "unit": "steps/sec",
        "vs_baseline": round(steps_per_sec / 100.0, 3),
        "submetrics": submetrics,  # mutated in place by the blocks below
    })

    if submetrics_on:
        run_submetrics(pipeline, imgs, enc, factor, size, steps, submetrics)
    # independent of BENCH_SUBMETRICS — BENCH_EXPERIMENT alone governs the
    # full-experiment wall (the docstring's contract)
    if os.environ.get("BENCH_EXPERIMENT", "1") == "1":
        run_experiment_wall(pipeline, imgs, size, submetrics)

    result = {
        "metric": f"PGD attack steps/sec, batch-{batch}, {size}^2 fusion inputs",
        "value": round(steps_per_sec, 3),
        "unit": "steps/sec",
        "vs_baseline": round(steps_per_sec / 100.0, 3),
        "submetrics": submetrics,
    }
    if tpu_unavailable:
        result["tpu_unavailable"] = True
        result["metric"] += " (CPU-TINY FALLBACK — TPU tunnel down)"
    print(json.dumps(result))
    return 0


def run_submetrics(pipeline, imgs, enc, factor, size, steps, out: dict) -> None:
    """The non-headline hot programs, every run (VERDICT r2 weak #2)."""
    import jax
    import jax.numpy as jnp

    from tpufusion.attacks.pgd import PGDConfig, make_pgd

    batch = imgs.shape[0]

    # ---- encoder-latent-drift PGD (the framework's own 'pgd' attack
    # objective) — the full e4e-50 backward per step.
    from tpufusion.core.imaging import avg_pool

    latent_org = jax.jit(lambda p, x: enc(p, avg_pool(x, factor)))(
        pipeline.enc_vars, imgs
    )

    def drift_loss(adv, enc_params, ref_codes):
        codes = enc(enc_params, avg_pool(adv, factor))
        return jnp.mean((codes - ref_codes) ** 2)

    drift_steps = max(steps // 4, 1)
    dattack = make_pgd(
        drift_loss,
        PGDConfig(eps=16 / 255, alpha=0.01, steps=drift_steps, random_start=True),
    )
    adv2, dtrace = dattack(imgs, jax.random.key(6), pipeline.enc_vars, latent_org)
    _ = float(dtrace[-1])  # warm/compile
    t0 = time.time()
    adv2, dtrace = dattack(imgs, jax.random.key(7), pipeline.enc_vars, latent_org)
    _ = float(dtrace[-1])
    ddt = time.time() - t0
    log(f"encoder-drift pgd: {drift_steps} steps in {ddt:.2f}s -> "
        f"{drift_steps / ddt:.2f} steps/sec (full e4e-50 backward)")
    out["encoder_drift_pgd_steps_per_sec"] = round(drift_steps / ddt, 3)

    # ---- white-box attack step (SURVEY §3.3: encoder x2 + full synthesis +
    # VGG fwd + backward through all of them + Adam).  Stepwise executor:
    # the scanned whole-loop program trips this deployment's AOT compile
    # helper; one-step programs compile in ~25 s.
    from tpufusion.attacks.whitebox import (
        PRESET_ATTACK_MAIN, WhiteboxConfig, make_whitebox_stepper,
    )

    wcfg = WhiteboxConfig(lr=1e-3, n_iters=1, weights=PRESET_ATTACK_MAIN)
    winit, wstep = make_whitebox_stepper(pipeline, wcfg)
    targets = jnp.broadcast_to(
        jax.random.uniform(jax.random.key(4), (1, size, size, 3),
                           jnp.float32, -1, 1),
        imgs.shape,
    )
    t0 = time.time()
    state = winit(imgs, targets)
    state, terms = wstep(state)
    _ = float(terms["total"])
    log(f"whitebox compile+warmup in {time.time() - t0:.1f}s")
    n_wsteps = max(steps // 10, 1)
    t0 = time.time()
    for _ in range(n_wsteps):
        state, terms = wstep(state)
    _ = float(terms["total"])
    wdt = time.time() - t0
    log(f"whitebox: {n_wsteps} steps in {wdt:.2f}s -> "
        f"{n_wsteps / wdt:.2f} steps/sec (enc+dec+vgg backward)")
    out["whitebox_steps_per_sec"] = round(n_wsteps / wdt, 3)
    out["whitebox_ms_per_step"] = round(1000 * wdt / n_wsteps, 2)
    # free the batch-8 attack state (pixels + Adam moments + targets,
    # ~0.5 GB at 1024^2) before the effective-batch-2x run below — the
    # first on-hardware b2x run OOMed with these still resident
    del state, terms, adv2, dtrace

    # ---- white-box microbatch (VERDICT r4 #8): effective batch 2x via
    # grad_accum=2 — the single-chip answer to the batch-16 @1024^2 OOM
    # (18.1 vs 15.75 GB): the full batch's pixel+Adam state stays resident
    # but only ONE chunk's fwd/bwd activations are live at a time.
    import dataclasses

    from tpufusion.attacks.whitebox import vmap_whitebox_stepwise

    ga_iters = max(steps // 20, 2)
    ga_cfg = dataclasses.replace(
        wcfg, n_iters=ga_iters, execution="stepwise", grad_accum=2)
    ga_attack = vmap_whitebox_stepwise(pipeline, ga_cfg)
    imgs2x = jnp.concatenate([imgs, -imgs])
    try:
        t0 = time.time()
        _adv, gatr = ga_attack(imgs2x, targets[:1])
        _ = float(gatr["total"][0, -1])
        log(f"whitebox microbatch compile+warmup ({ga_iters} iters, "
            f"batch {imgs2x.shape[0]} eff = 2 x {batch}) in "
            f"{time.time() - t0:.1f}s")
        del _adv, gatr  # the warmup's 2x pixel output, live across the timed run
        t0 = time.time()
        _adv, gatr = ga_attack(imgs2x, targets[:1])
        _ = float(gatr["total"][0, -1])
        gdt = time.time() - t0
        log(f"whitebox microbatch (grad_accum=2): {ga_iters} steps at "
            f"effective batch {imgs2x.shape[0]} in {gdt:.2f}s -> "
            f"{ga_iters / gdt:.2f} steps/sec "
            f"({1000 * gdt / ga_iters:.1f} ms/step, no OOM)")
        out["whitebox_b2x_eff_batch"] = int(imgs2x.shape[0])
        out["whitebox_b2x_steps_per_sec"] = round(ga_iters / gdt, 3)
        out["whitebox_b2x_ms_per_step"] = round(1000 * gdt / ga_iters, 2)
        del _adv, gatr
    except Exception as exc:  # noqa: BLE001 — one OOMing submetric must
        # not forfeit the rest of the round's evidence (VERDICT r4 #1)
        log(f"whitebox microbatch FAILED ({exc!r}) — continuing")
        out["whitebox_b2x_error"] = repr(exc)
    del imgs2x, ga_attack

    # ---- partial-fusion sweep: N+1 spatial variants as ONE batched
    # synthesis (`interpolation.py:978-1031`; eval/partial.py)
    from tpufusion.eval import partial_adv_fusion
    from tpufusion.fusion import n_inputs

    n = n_inputs(pipeline.dataset)
    reps = -(-n // batch)  # wrap the bench batch up to the fusion group size
    imgs_n = jnp.concatenate([imgs] * reps, axis=0)[:n]
    latents = jax.jit(lambda p, x: enc(p, avg_pool(x, factor)))(
        pipeline.enc_vars, imgs_n)
    latents = latents + pipeline.latent_avg
    adv_latents = latents + 0.01

    def sweep():
        return partial_adv_fusion(pipeline.drawer, latents, adv_latents,
                                  "spatial")

    r = sweep()
    _ = float(jnp.sum(r[-1]))  # warm/compile
    t0 = time.time()
    n_sweeps = 5
    for _ in range(n_sweeps):
        r = sweep()
    _ = float(jnp.sum(r[-1]))
    sdt = (time.time() - t0) / n_sweeps
    log(f"partial-fusion sweep ({n + 1} variants, spatial): {sdt * 1000:.1f} ms")
    out["partial_fusion_sweep_ms"] = round(sdt * 1000, 2)

    # ---- patch-training inner iterations (`adversarial_patch.py:94-160`;
    # max_count=50 x train_size=2000 images is the reference's costliest
    # job).  One measured unit = one inner iteration: encoder fwd + bwd to
    # the pasted canvas + raw GD patch update.
    from tpufusion.attacks.patch import (
        PatchConfig, init_patch_square, make_patch_attack_step,
    )

    max_count = max(steps // 10, 2)
    pcfg = PatchConfig(patch_frac=0.1, max_count=max_count)
    pstep = make_patch_attack_step(pipeline, pcfg)
    patch = init_patch_square(size, 0.1, jax.random.key(8))
    img1 = imgs[:1]
    t0 = time.time()
    new_patch, ptrace = pstep(img1, patch, jax.random.key(9))
    _ = float(ptrace[-1])
    log(f"patch-train compile+warmup ({max_count} iters) in "
        f"{time.time() - t0:.1f}s")
    t0 = time.time()
    p_calls = 3
    for c in range(p_calls):
        new_patch, ptrace = pstep(img1, new_patch, jax.random.fold_in(
            jax.random.key(10), c))
    _ = float(ptrace[-1])
    pdt = time.time() - t0
    p_rate = max_count * p_calls / pdt
    log(f"patch-train: {p_calls}x{max_count} inner iters in {pdt:.2f}s -> "
        f"{p_rate:.2f} iters/sec (reference budget: 50 x 2000 imgs = 1e5 "
        f"iters -> {1e5 / p_rate / 60:.1f} min/epoch here)")
    out["patch_train_iters_per_sec"] = round(p_rate, 3)

    # ---- fusion-aware PGD (BASELINE config 2; attacks/fusion_attack.py):
    # every step backprops through encoder -> mean-W+ -> FULL synthesis —
    # the strictly-stronger-than-reference attack this framework enables
    from tpufusion.attacks.fusion_attack import (
        FusionAttackConfig, make_fusion_attack,
    )

    fp_steps = max(steps // 20, 2)
    facfg = FusionAttackConfig(
        mode="arithmetic", objective="pixel", targeted=True,
        pgd=PGDConfig(eps=0.06, alpha=0.01, steps=fp_steps,
                      random_start=False),
    )
    fattack = make_fusion_attack(pipeline, facfg)
    f_target = imgs[:1]
    t0 = time.time()
    fadv, ftr = fattack(imgs_n, f_target, jax.random.key(12))
    _ = float(ftr[-1])
    log(f"fusion-pgd compile+warmup ({fp_steps} steps) in "
        f"{time.time() - t0:.1f}s")
    t0 = time.time()
    fadv, ftr = fattack(imgs_n, f_target, jax.random.key(13))
    _ = float(ftr[-1])
    fdt = time.time() - t0
    log(f"fusion-pgd (arith, {n} inputs): {fp_steps} steps in {fdt:.2f}s -> "
        f"{fp_steps / fdt:.2f} steps/sec (full encoder+synthesis backward); "
        f"loss {float(ftr[0]):.4f} -> {float(ftr[-1]):.4f}")
    out["fusion_pgd_steps_per_sec"] = round(fp_steps / fdt, 3)


def run_experiment_wall(pipeline, imgs, size, out: dict) -> None:
    """FULL experiment at reference budgets (VERDICT r3 ask #1): one
    complete run of the reference's actual unit of work
    (`attack_main2.py:990-1111`): white-box attack at the reference's
    iteration budget for this size (ITER_DICT: 100 @ 1024^2) on all N
    fusion inputs WITH the save_img snapshot cadence, benign fusion both
    modes, both (N+1)-variant partial-fusion sweeps, the MSE/VGG/SSIM
    metric table, and every artifact write (montages, npz stores, xlsx).
    Run twice; the second run is the steady-state number (compiles are
    one-time and persist in the compile cache, like the reference's
    first-batch graph builds amortise over its 2000-image sweeps)."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from tpufusion.configs import AttackRunConfig
    from tpufusion.fusion import n_inputs
    from tpufusion.runner import run_experiment

    n = n_inputs(pipeline.dataset)
    reps = -(-n // imgs.shape[0])
    imgs_n = jnp.concatenate([imgs] * reps, axis=0)[:n]

    ecfg = AttackRunConfig(
        dataset_name=pipeline.dataset, attacks=("white_box_target",),
        lr=1e-4, whitebox_execution="stepwise",
        snapshot_every=5, flush_every=5,
    )
    e_iters = ecfg.iters_for(size)
    e_target = imgs_n[:1]

    def one_experiment(k):
        with tempfile.TemporaryDirectory() as td:
            t0 = time.time()
            run_experiment(pipeline, ecfg, imgs_n, e_target,
                           jax.random.key(21 + k), save_root=td)
            return time.time() - t0
    w1 = one_experiment(0)
    w2 = one_experiment(1)
    log(f"full experiment (whitebox {e_iters} iters x {n} inputs + "
        f"2 partial sweeps + metrics + artifacts): {w2:.1f}s "
        f"steady-state ({w1:.1f}s incl. compile)")
    out["experiment_wall_s"] = round(w2, 2)
    out["experiment_iters"] = e_iters


if __name__ == "__main__":
    try:
        sys.exit(main())
    except Exception as exc:  # noqa: BLE001 — driver contract: always JSON
        # Last-resort guard (VERDICT r4 weak #1): a perf harness that emits
        # NO artifact forfeits the round's evidence.  Emit a parsable JSON
        # line naming the failure and exit 0 so BENCH_r{N}.json records it.
        import traceback

        traceback.print_exc()
        if "value" in _PARTIAL:
            # the headline (and every completed submetric) was measured
            # before the failure — salvage it
            _PARTIAL["error"] = repr(exc)
            _PARTIAL["partial"] = True
            print(json.dumps(_PARTIAL))
        else:
            print(json.dumps({
                "metric": "bench crashed before producing a headline",
                "value": 0.0,
                "unit": "steps/sec",
                "vs_baseline": 0.0,
                "error": repr(exc),
            }))
        sys.exit(0)
