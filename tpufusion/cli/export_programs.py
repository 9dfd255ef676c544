"""Export serving artifacts: compiled decode/spatial-fusion programs + weights.

Produces, under ``--out``:
  - ``decode.jexp``            (gen_vars, codes) -> image
  - ``fusion.jexp`` (+.roles)  (gen_vars, blend_params, mean, base, *swaps) -> fused image
  - ``params.npz``             generator/blender/mean-latent weights (params_io)

A serving process needs only ``tpufusion.io.load_program`` + ``load_pytree``
(no model-building code).  Export on the platform you serve on.

Example:
    python -m tpufusion.cli.export_programs --dataset church --tiny --size 32 \
        --out artifacts/
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="tpufusion serving-artifact export")
    p.add_argument("--dataset", default="ffhq", choices=["ffhq", "car", "church"])
    p.add_argument("--size", type=int, default=None)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--batch", type=int, default=1, help="decode batch size")
    p.add_argument("--out", required=True)
    p.add_argument("--stylegan_ckpt", default=None,
                   help="rosinality g_ema checkpoint to convert and embed in "
                        "params.npz (random init otherwise)")
    p.add_argument("--fusion_weights", default=None,
                   help="fusion-net weights JSON manifest")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    from tpufusion.io import export_decode, export_spatial_fusion
    from tpufusion.io.params_io import save_pytree
    from tpufusion.pipeline import FusionPipeline, create_test_pipeline

    if args.tiny:
        pipeline = create_test_pipeline(args.dataset, jax.random.key(0),
                                        size=args.size or 32)
    else:
        pipeline = FusionPipeline.create(args.dataset, jax.random.key(0),
                                         size=args.size)
    if args.stylegan_ckpt or args.fusion_weights:
        # one checkpoint-wiring implementation, shared with attack_run
        from tpufusion.cli.attack_run import _maybe_load_checkpoints
        from tpufusion.configs import PathsConfig

        pipeline = _maybe_load_checkpoints(pipeline, PathsConfig(
            stylegan_ckpt=args.stylegan_ckpt,
            fusion_weights=args.fusion_weights,
        ))

    os.makedirs(args.out, exist_ok=True)
    d = export_decode(pipeline, os.path.join(args.out, "decode.jexp"),
                      batch=args.batch)
    f = export_spatial_fusion(pipeline.drawer,
                              os.path.join(args.out, "fusion.jexp"))
    w = save_pytree(
        dict(gen_vars=pipeline.drawer.gen_vars,
             blend_params=pipeline.drawer.blend_params,
             mean_latent=pipeline.drawer.mean_latent),
        os.path.join(args.out, "params.npz"),
    )
    for path in (d, f, f + ".roles", w):
        print(f"[export] {path} ({os.path.getsize(path)} bytes)")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
