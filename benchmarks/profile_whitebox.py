"""Device-trace attribution of the whitebox step (DESIGN §9 evidence).

Runs the stepper under ``jax.profiler.trace`` and prints the top TPU ops by
device time (parsed from the chrome-trace export).  Cross-reference op
names against ``MFU_DUMP_HLO`` output: each fusion's ``metadata.op_name``
names the model layer and source line it came from.

Measured on v5e (batch-8, 1024²): the step runs 152.4 ms on-device; the
top individual kernels are the synthesis TAIL conv forwards and backwards
(`multiply_reduce_fusion.*` = conv grads at 1024² c32 / 512² c64,
~43 ms; forward tail convs ~30 ms) — confirming the per-piece and
stream-probe analysis that the low-channel tail is the named residual
headroom while the step as a whole sits at the chip's achievable
bandwidth.

Run on TPU: python benchmarks/profile_whitebox.py  (env: PW_SIZE, PW_BATCH,
PW_STEPS, PW_TOP)
"""

from __future__ import annotations

import collections
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from benchmarks.common import setup_cache

    setup_cache()

    size = int(os.environ.get("PW_SIZE", "1024"))
    batch = int(os.environ.get("PW_BATCH", "8"))
    steps = int(os.environ.get("PW_STEPS", "3"))
    top = int(os.environ.get("PW_TOP", "25"))

    from tpufusion.attacks.whitebox import (
        PRESET_ATTACK_MAIN,
        WhiteboxConfig,
        make_whitebox_stepper,
    )
    from tpufusion.pipeline import FusionPipeline

    pipeline = FusionPipeline.create("ffhq", jax.random.key(0), size=size,
                                     mean_latent_samples=64)
    cfg = WhiteboxConfig(lr=1e-3, n_iters=1, weights=PRESET_ATTACK_MAIN)
    init, step = make_whitebox_stepper(pipeline, cfg)
    imgs = jax.random.uniform(jax.random.key(1), (batch, size, size, 3),
                              jnp.float32, -1, 1)
    state = init(imgs, jnp.broadcast_to(imgs[:1], imgs.shape))
    state, terms = step(state)
    _ = float(terms["total"])  # compile + warm

    trace_dir = os.environ.get("PW_TRACE_DIR") or tempfile.mkdtemp()
    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            state, terms = step(state)
        _ = float(terms["total"])

    # newest trace wins — a reused PW_TRACE_DIR accumulates one timestamped
    # session subdir per run and os.walk order is filesystem-dependent
    traces = [os.path.join(r, f)
              for r, _dirs, files in os.walk(trace_dir)
              for f in files if f.endswith(".trace.json.gz")]
    path = max(traces, key=os.path.getmtime) if traces else None
    if path is None:
        print(json.dumps({"error": "no trace produced", "dir": trace_dir}))
        return 1
    with gzip.open(path, "rt") as fh:
        tr = json.load(fh)
    events = tr.get("traceEvents", [])
    pids = {e.get("pid"): e.get("args", {}).get("name", "") for e in events
            if e.get("name") == "process_name"}
    by_name: collections.Counter = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            pname = pids.get(e.get("pid"), "")
            if "TPU" in pname or "device" in pname.lower():
                by_name[e["name"]] += e["dur"]
    print(f"# device ops by time, {steps} steps (trace: {path})")
    for name, dur in by_name.most_common(top):
        print(json.dumps({"op": name[:120],
                          "ms_per_step": round(dur / 1e3 / steps, 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
