"""Host data-pipeline throughput: native C++ ops vs the numpy/PIL fallbacks.

The decode→resize→normalize preprocessing runs on the host while the chips
attack (`data/transforms.py` calls `data/native.py` when
``native/libtpufusion_host.so`` is built).  This prints a per-op table so
the native component's value is a measured number, not a claim.

Run:  python benchmarks/host_ops_bench.py   (CPU-only; no jax involved)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpufusion.data import native  # noqa: E402


def timeit(fn, *args, iters=20):
    fn(*args)  # warm
    t0 = time.time()
    for _ in range(iters):
        fn(*args)
    return (time.time() - t0) / iters


def main() -> int:
    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 256, (1024, 1024, 3), dtype=np.uint8)
    pm1 = rng.uniform(-1, 1, (8, 1024, 1024, 3)).astype(np.float32)
    imgs = rng.uniform(-1, 1, (5, 256, 256, 3)).astype(np.float32)

    have = native.available()
    print(f"native library available: {have}")
    rows = []

    def compare(name, fn, *args):
        t_native = timeit(fn, *args) if have else None
        # numpy fallback: temporarily hide the library from the dispatcher
        saved = native._load
        native._load = lambda: None
        try:
            t_fallback = timeit(fn, *args)
        finally:
            native._load = saved
        rows.append((name, t_native, t_fallback))

    compare("resize_normalize 1024->256 u8", native.resize_normalize, u8, 256, 256)
    compare("resize_normalize 1024->1024 u8", native.resize_normalize, u8, 1024, 1024)
    compare("normalize_u8_to_pm1 1024^2", native.normalize_u8_to_pm1, u8)
    compare("avg_pool b8 1024->256", native.avg_pool, pm1, 4)
    compare("montage_strip 5x256^2", native.montage_strip, imgs)

    print(f"{'op':36s} {'native ms':>10s} {'numpy ms':>10s} {'speedup':>8s}")
    for name, tn, tf in rows:
        ns = f"{tn * 1e3:10.2f}" if tn is not None else "       n/a"
        fs = f"{tf * 1e3:10.2f}" if tf is not None else "       n/a"
        sp = f"{tf / tn:7.1f}x" if tn and tf else "     n/a"
        print(f"{name:36s} {ns} {fs} {sp}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
