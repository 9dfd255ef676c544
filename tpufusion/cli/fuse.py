"""Seeded z-fusion demo — CLI analog of ``stylefusion()``
(`attack_main2.py:47-72`): five fixed-seed z codes, per-part spatial fusion,
montage of the five parts + the fused face.

    python -m tpufusion.cli.fuse --dataset ffhq --size 32 --tiny --out fused.jpg
"""

from __future__ import annotations

import argparse
import sys


# the reference demo's (seed, index) pairs (`attack_main2.py:53-57`)
DEMO_SEEDS = dict(
    mouth=(6, 7), background=(23, 8), hair=(334, 6), eyes=(337, 5), global_=(393, 5)
)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="tpufusion z-fusion demo")
    p.add_argument("--dataset", default="ffhq", choices=["ffhq", "car", "church"])
    p.add_argument("--size", type=int, default=None)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--channel_multiplier", type=int, default=2)
    p.add_argument("--out", default="fused_demo.jpg")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tpufusion.core.dtypes import Policy, default_policy
    from tpufusion.fusion import FusionDrawer
    from tpufusion.io import save_montage

    policy = Policy() if args.tiny else default_policy()
    drawer = FusionDrawer.create(
        args.dataset, jax.random.key(0), size=args.size,
        channel_multiplier=1 if args.tiny else args.channel_multiplier,
        policy=policy, mean_latent_samples=64 if args.tiny else 4096,
    )

    z = {k: drawer.seed_to_z(v) for k, v in DEMO_SEEDS.items()}
    parts = []
    for name in ("background", "hair", "eyes", "mouth", "global_"):
        img, _ = drawer.generate_img(z[name], latents_type="z")
        parts.append(img)
    if args.dataset == "ffhq":
        fused, _ = drawer.generate_img(
            z["global_"], latents_type="z", hair=z["hair"], eyes=z["eyes"],
            background=z["background"], mouth=z["mouth"],
        )
    elif args.dataset == "car":
        fused, _ = drawer.generate_img(
            z["global_"], latents_type="z", wheels=z["mouth"],
            bg_top=z["background"], bg_bottom=z["hair"],
        )
    else:
        fused, _ = drawer.generate_img(
            z["global_"], latents_type="z", bg_top=z["background"],
            bg_bottom=z["hair"],
        )
    strip = jnp.concatenate(parts + [fused], axis=0)
    out = save_montage(strip, args.out, nrow=strip.shape[0])
    print(f"[fuse] wrote {out} ({strip.shape[0]} panels)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
