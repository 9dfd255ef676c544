"""Rebuild tests/slow_manifest.txt from a pytest --durations log.

The manifest drives the two-tier test suite: conftest marks every listed
nodeid `slow`, making `pytest -m "not slow"` the <5-min per-commit tier on
the 1-core reference box while `pytest tests/` stays the full CI tier.

Usage:
    python -m pytest tests/ -q --durations=0 > /tmp/durations.log
    python tools/update_slow_manifest.py /tmp/durations.log [--threshold 3.0]
"""

from __future__ import annotations

import argparse
import os
import re

HEADER = """\
# Tests measured >= {thr:g}s call time on the 1-core reference box
# (full-suite --durations run).  Regenerate with:
#   python -m pytest tests/ -q --durations=0 > /tmp/durations.log
#   python tools/update_slow_manifest.py /tmp/durations.log
# conftest.pytest_collection_modifyitems marks these 'slow';
# fast tier = `pytest -m "not slow"` must stay <5 min.
"""


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("log", help="pytest output containing --durations lines")
    p.add_argument("--threshold", type=float, default=3.0,
                   help="mark tests with call time >= this many seconds "
                        "(the committed manifest was generated at 3.0 — "
                        "keep the default in sync with its header)")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "slow_manifest.txt"))
    args = p.parse_args(argv)

    slow = set()
    with open(args.log) as f:
        for line in f:
            m = re.match(r"^(\d+\.\d+)s call\s+(\S+)", line)
            if m and float(m.group(1)) >= args.threshold:
                slow.add(m.group(2))
    if not slow:
        raise SystemExit(
            "no durations found — run pytest with --durations=0 (or a large "
            "N) and pass its full output")
    with open(args.out, "w") as f:
        f.write(HEADER.format(thr=args.threshold))
        for nid in sorted(slow):
            f.write(nid + "\n")
    print(f"wrote {len(slow)} nodeids -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
