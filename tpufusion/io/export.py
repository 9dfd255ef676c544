"""AOT program export for serving — serialize compiled fusion programs.

The reference has no serving story (research scripts only); a production
deployment wants the hot inference programs — W+ decode and spatial fusion —
as *portable artifacts* that a serving process can load and execute without
the model-building Python (`jax.export` StableHLO serialization).

Design choice: params are ARGUMENTS of the exported program, not embedded
constants (the repo-wide compile-scaling rule, docs/DESIGN.md §5) — the
artifact stays a few MB of program, and weights ship separately via
``io.params_io.save_pytree``.  Artifacts record the lowering platform
(export on TPU for TPU serving; CPU artifacts serve on CPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_program(fn, example_args, path: str) -> str:
    """Serialize ``jit(fn)`` lowered at ``example_args`` to ``path``.

    ``fn`` must be pure with array/pytree arguments; the exported artifact
    accepts exactly the example shapes/dtypes.
    """
    exported = jax_export.export(jax.jit(fn))(*example_args)
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)
    return path


def load_program(path: str):
    """Deserialize an exported program; returns a callable (jit-compatible)
    with ``.in_avals`` (expected shapes/dtypes) and ``.platforms`` attached."""
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())

    def fn(*args):
        return exported.call(*args)

    fn.in_avals = exported.in_avals
    fn.platforms = exported.platforms
    return fn


def export_decode(pipeline, path: str, *, batch: int = 1) -> str:
    """Export ``(gen_vars, codes[batch, n_latent, 512]) -> image`` — the
    serving form of ``decoder([codes], input_is_latent=True)``
    (`attack_main2.py:619-621`)."""
    dec = pipeline.decode_fn()
    codes = jnp.zeros((batch, pipeline.generator.n_latent, 512), jnp.float32)
    return export_program(dec, (pipeline.drawer.gen_vars, codes), path)


def export_spatial_fusion(drawer, path: str) -> str:
    """Export the full spatial-fusion forward for the drawer's dataset:
    ``(gen_vars, blend_params, mean_latent, base_w+, *swap_w+) -> image``
    with the role keywords of ``ROLE_MAPS[dataset]`` in swap-table order
    (the program `fusion()` runs per group, `attack_main2.py:521-581`).

    Returns the path; the argument order of the swaps is recorded in the
    companion ``<path>.roles`` text file.
    """
    from tpufusion.fusion.drawer import SWAP_TABLE
    from tpufusion.fusion.spatial import ROLE_MAPS

    cfg = ROLE_MAPS[drawer.dataset]
    provided = tuple(k for k, _ in SWAP_TABLE if k in cfg["kwargs"])
    run = drawer._generate_fn("w", provided)

    def image_only(v, bp, mean, base, *swaps):
        return run(v, bp, mean, base, *swaps).image

    shape = (1, drawer.generator.n_latent, 512)
    w = jnp.zeros(shape, jnp.float32)
    example = (drawer.gen_vars, drawer.blend_params, drawer.mean_latent,
               w) + (w,) * len(provided)
    export_program(image_only, example, path)
    with open(path + ".roles", "w") as f:
        f.write("base=" + cfg["base"] + "\n")
        for kw in provided:
            f.write(f"{kw}={cfg['kwargs'][kw]}\n")
    return path
