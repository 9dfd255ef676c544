"""Orbax checkpointing — the sharded/production path next to ``params_io``.

``params_io`` (npz) gathers every array to one host — fine for converted
model weights, wrong for multi-chip state: a DP/TP-sharded attack state
would be unsharded on save and replicated on restore.  Orbax writes each
shard from the device that owns it and restores onto the target shardings,
so checkpoint/resume composes with the ``parallel/`` mesh (SURVEY §5 has no
reference counterpart; this is the deployment-grade half of the resume
story, `io/attack_state.py` being the single-host half).
"""

from __future__ import annotations

import os

import jax


def save_checkpoint(path: str, tree) -> str:
    """Write ``tree`` (pytree of arrays, sharded or not) to ``path``."""
    # lazy import: orbax is only needed by callers of THIS module — a
    # top-level import would make it a hard dependency of all of tpufusion.io
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree)
    return path


def restore_checkpoint(path: str, template):
    """Restore a checkpoint onto ``template``'s structure AND shardings.

    ``template`` supplies shapes/dtypes and, for sharded leaves, the target
    ``NamedSharding`` — pass a freshly-built (or ``jax.eval_shape``-style)
    state placed the way the restored one should be.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)

    def spec(leaf):
        if isinstance(leaf, jax.Array):
            return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype,
                                        sharding=leaf.sharding)
        return leaf

    abstract = jax.tree.map(spec, template)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, abstract)
