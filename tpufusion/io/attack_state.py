"""Mid-attack checkpoint/resume — failure recovery for long attack runs.

The reference's only resume story is reloading end-of-attack artifacts
(`attack_main2.py:1096-1111`, `interpolation.py:1274-1313`,
`patch/adversarial_patch.py:211-213`); an interrupted white-box or patch
optimisation restarts from scratch.  Here every attack's optimiser state is
a pytree of arrays (pixel buffer + Adam moments + the stop-gradient
reference bundle for the whitebox stepper; the patch array for patch
training), so a checkpoint is one ``.npz`` of leaves.  The treedef is
structural — it is NOT serialised; resume rebuilds the pytree against a
template produced by the same ``init`` that produced the original state.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def save_attack_state(state, path: str, *, step: int) -> str:
    """Persist an attack-state pytree (+ iteration counter) to ``path``.

    Writes atomically (tmp file + rename) so a crash mid-write never
    corrupts the previous checkpoint.
    """
    leaves = jax.tree.leaves(jax.device_get(state))
    payload = {f"leaf_{i:04d}": np.asarray(l) for i, l in enumerate(leaves)}
    payload["__step__"] = np.asarray(step, np.int64)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)
    return path


def load_attack_state(path: str, template):
    """Restore ``(state, step)`` from ``path``.

    ``template`` is a freshly-built state with the SAME structure (from the
    attack's ``init``); its leaves supply the treedef and dtypes.
    """
    treedef = jax.tree.structure(template)
    t_leaves = jax.tree.leaves(template)
    with np.load(path) as data:
        step = int(data["__step__"])
        keys = sorted(k for k in data.files if k.startswith("leaf_"))
        if len(keys) != len(t_leaves):
            raise ValueError(
                f"checkpoint {path} has {len(keys)} leaves but the template "
                f"state has {len(t_leaves)} — wrong attack/config?"
            )
        leaves = [
            jnp.asarray(data[k], dtype=t.dtype)
            for k, t in zip(keys, t_leaves)
        ]
    for got, want in zip(leaves, t_leaves):
        if got.shape != jnp.shape(want):
            raise ValueError(
                f"checkpoint leaf shape {got.shape} != template "
                f"{jnp.shape(want)} — wrong image size/batch?"
            )
    return jax.tree.unflatten(treedef, leaves), step


def run_whitebox_resumable(pipeline, img, target_img, config,
                           checkpoint_path: str, *, checkpoint_every: int = 10):
    """Host-looped white-box attack with periodic state checkpoints.

    Same semantics as ``attacks.whitebox.run_whitebox_stepwise`` but the
    stepper state is saved to ``checkpoint_path`` every ``checkpoint_every``
    iterations and on completion; if the file already exists the run resumes
    from the recorded iteration (Adam moments and the precomputed reference
    bundle restore exactly, so the trajectory is identical to an unbroken
    run).  Returns ``(adv, trace, start_iter)`` where ``trace`` covers the
    iterations executed in THIS call.
    """
    from tpufusion.attacks.whitebox import make_whitebox_stepper

    init, step = make_whitebox_stepper(pipeline, config)
    state = init(img, target_img)
    start = 0
    if os.path.exists(checkpoint_path):
        state, start = load_attack_state(checkpoint_path, state)
    traces = []
    for i in range(start, config.n_iters):
        state, terms = step(state)
        traces.append(terms)
        done = i + 1
        if checkpoint_every and (done % checkpoint_every == 0
                                 or done == config.n_iters):
            save_attack_state(state, checkpoint_path, step=done)
    if traces:
        trace = jax.tree.map(lambda *xs: jnp.stack(xs), *traces)
    else:  # already complete — nothing executed
        trace = None
    return state["x"], trace, start


def run_whitebox_sharded_resumable(
    pipeline, inputs, target_img, config, which_adv, mesh,
    checkpoint_dir: str, *, checkpoint_every: int = 10,
):
    """Multi-chip variant of :func:`run_whitebox_resumable`: the DP sharded
    white-box attack (``parallel.run_whitebox_sharded`` semantics — padded
    batch over the ``data`` axis, which_adv selection) with periodic ORBAX
    checkpoints of the SHARDED state (`io/orbax_io.py` — each host writes
    its shards; restore places leaves back onto the template's
    NamedShardings, so a resumed run continues with the exact trajectory).

    Checkpoints live under ``checkpoint_dir/step_N``; the newest restorable
    one wins, older ones are pruned after a successful save (the previous
    checkpoint survives any crash mid-save).  If checkpoints exist but NONE
    restores (changed batch/size/config, incompatible Orbax version), this
    raises instead of silently restarting from 0 — a restart would prune
    the prior progress on its first save; clear ``checkpoint_dir``
    explicitly to start over.  (Building the restore template costs one
    ``init`` — the simplest carrier of the target NamedShardings that
    ``restore_checkpoint`` places leaves onto.)  Returns
    ``(adv_inputs, trace, start_iter)``.
    """
    import glob
    import re
    import shutil

    from tpufusion.io.orbax_io import restore_checkpoint, save_checkpoint
    from tpufusion.parallel.sharding import (
        make_sharded_whitebox_step,
        prepare_whitebox_batch,
    )

    idx, sub_p, targets_p, n_real = prepare_whitebox_batch(
        inputs, target_img, which_adv, mesh)

    step, init, place_batch = make_sharded_whitebox_step(pipeline, config, mesh)
    imgs, tgts = place_batch(sub_p, targets_p)
    with mesh:
        state = init(imgs, tgts)

    os.makedirs(checkpoint_dir, exist_ok=True)
    start = 0
    # only completed step_N dirs — Orbax's atomic-save protocol leaves
    # 'step_N.orbax-checkpoint-tmp-*' behind after a crash mid-save, which
    # must neither be restored nor break the sort
    candidates = sorted(
        (p for p in glob.glob(os.path.join(checkpoint_dir, "step_*"))
         if re.fullmatch(r"step_\d+", os.path.basename(p))),
        key=lambda p: int(p.rsplit("_", 1)[1]), reverse=True)
    errors = []
    for cand in candidates:
        try:
            state = restore_checkpoint(cand, state)
            start = int(cand.rsplit("_", 1)[1])
            break
        except Exception as e:  # partial save: fall back to the previous
            errors.append(f"{os.path.basename(cand)}: {e}")
            print(f"[attack_state] WARNING: could not restore {cand}: {e}")
    if candidates and start == 0 and errors:
        raise RuntimeError(
            f"{checkpoint_dir} holds {len(candidates)} checkpoint(s) but "
            f"none restored (wrong batch/size/config?): {errors[:2]} — "
            "refusing to restart from 0 (the first new save would prune "
            "them); clear the directory to start over")

    losses = []
    with mesh:
        for i in range(start, config.n_iters):
            state, per = step(state)  # (B,) per-image losses
            losses.append(per)
            done = i + 1
            if checkpoint_every and (done % checkpoint_every == 0
                                     or done == config.n_iters):
                path = os.path.join(checkpoint_dir, f"step_{done}")
                if os.path.exists(path):
                    shutil.rmtree(path)
                save_checkpoint(path, state)
                for old in glob.glob(os.path.join(checkpoint_dir, "step_*")):
                    if old != path:  # prune older + leftover tmp dirs
                        shutil.rmtree(old, ignore_errors=True)

    adv_sel = state["x"][:n_real]
    adv = inputs.at[idx].set(adv_sel)
    # (n_selected, iters-this-call) per-image trajectories, pad rows dropped
    trace = jnp.stack(losses, axis=1)[:n_real] if losses else None
    return adv, trace, start
