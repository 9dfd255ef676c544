"""Inversion utility — CLI analog of ``inversion()`` /
``generate_inversions`` (reference C23, `attack_main2.py:75-94,173-182`):
batch-encode a dataset to latents.npz, then decode each latent back to an
inversion image (cars get the 64:448 centre crop).

    python -m tpufusion.cli.invert --images_dir data/ --dataset ffhq \
        --tiny --size 32 --save_dir runs/inv
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="tpufusion inversion")
    p.add_argument("--images_dir", required=True)
    p.add_argument("--dataset", default="ffhq", choices=["ffhq", "car", "church"])
    p.add_argument("--save_dir", default="runs/inversion")
    p.add_argument("--size", type=int, default=None)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--n_sample", type=int, default=None)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--latents_only", action="store_true")
    p.add_argument("--align", action="store_true",
                   help="FFHQ-align raw images before encoding "
                        "(`attack_main2.py:103-104` loader path)")
    p.add_argument("--landmark_net", default=None)
    p.add_argument("--dlib_predictor", default=None)
    p.add_argument("--mesh", default=None, metavar="N", type=int,
                   help="shard the encode batch over an N-device 'data' "
                        "mesh (batch-encode is embarrassingly parallel)")
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from tpufusion.data import BatchLoader, ImageFolderDataset, transform_for
    from tpufusion.io import save_image
    from tpufusion.pipeline import FusionPipeline, create_test_pipeline

    os.makedirs(args.save_dir, exist_ok=True)
    if args.tiny:
        pipeline = create_test_pipeline(args.dataset, jax.random.key(0), size=args.size or 32)
        transform = None  # raw [-1,1] resize below

        def tf(img):
            import numpy as _np

            img = img.resize((pipeline.image_size, pipeline.image_size))
            return _np.asarray(img, _np.float32) / 255.0 * 2.0 - 1.0
    else:
        pipeline = FusionPipeline.create(args.dataset, jax.random.key(0), size=args.size)
        tf = transform_for(args.dataset)

    preprocess = None
    if args.align:
        from tpufusion.data.alignment import resolve_align_preprocess

        preprocess = resolve_align_preprocess(
            args.landmark_net, args.dlib_predictor)
    ds = ImageFolderDataset(args.images_dir, transform=tf,
                            preprocess=preprocess)
    n = min(args.n_sample or len(ds), len(ds))
    loader = BatchLoader(ds, np.arange(n), args.batch, shuffle=False, drop_last=False)

    get_latents = pipeline.get_latents
    mesh = None
    if args.mesh and args.mesh > 1:
        from tpufusion.parallel import (
            batch_sharding,
            create_mesh,
            pad_batch_to_multiple,
        )

        if args.mesh > len(jax.devices()):
            raise SystemExit(
                f"--mesh {args.mesh} requests more devices than the "
                f"{len(jax.devices())} visible")
        mesh = create_mesh(jax.devices()[: args.mesh])
        data = mesh.shape["data"]
        print(f"[invert] DP encode over mesh {dict(mesh.shape)}")

        def get_latents(batch):  # noqa: F811 — sharded override
            padded, n_real = pad_batch_to_multiple(batch, data)
            padded = jax.device_put(padded, batch_sharding(mesh, padded.ndim))
            with mesh:
                out = pipeline.get_latents(padded)
            return out[:n_real]

    all_latents = []
    for batch in loader:
        all_latents.append(np.asarray(get_latents(jax.numpy.asarray(batch))))
    latents = np.concatenate(all_latents, axis=0)
    lat_path = os.path.join(args.save_dir, "latents.npz")
    np.savez(lat_path, latents=latents)
    print(f"[invert] encoded {latents.shape[0]} images -> {lat_path}")

    if not args.latents_only:
        inv_dir = os.path.join(args.save_dir, "inversions")
        os.makedirs(inv_dir, exist_ok=True)
        for i in range(latents.shape[0]):
            img = pipeline.decode(jax.numpy.asarray(latents[i : i + 1]))
            img = np.asarray(img)
            if pipeline.is_cars:
                # cars crop rows 64:448 of 512 (`attack_main2.py:180-181`),
                # scaled to the actual generator size
                s = pipeline.image_size
                img = img[:, s * 64 // 512 : s * 448 // 512]
            save_image(img, os.path.join(inv_dir, f"{i + 1:05d}.jpg"))
        print(f"[invert] wrote {latents.shape[0]} inversions -> {inv_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
