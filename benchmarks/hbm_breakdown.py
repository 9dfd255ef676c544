"""Static per-buffer HBM-traffic breakdown of a compiled XLA program.

The roofline bound for a bandwidth-bound program is (bytes moved)/(HBM BW);
XLA's ``cost_analysis`` reports ONE total for bytes moved.  This tool breaks
that total down: it parses the optimized HLO text and charges, for every
top-level instruction of the entry computation, one WRITE of its output
buffer and one READ per top-level use — exactly the buffers that live in
HBM between kernels (fusion-internal intermediates never leave VMEM, and the
entry computation after fusion is the kernel schedule).  Aliasing ops
(bitcast / get-tuple-element / tuple) are resolved to their source buffer
and charged nothing themselves.

Traffic is bucketed by buffer SHAPE, which is what makes the table
actionable: ``bf16[8,1024,1024,32]`` is "the 1024^2 synthesis activations",
``f32[8,256,256,64]`` is "the fp32 VGG conv1 taps", and so on.

Limitations (documented, acceptable for kernel-schedule analysis):
- ``while``/``call`` sub-computations are also parsed when present, each
  charged once (a scanned loop's per-iteration traffic multiplies by trip
  count — use the stepwise program for per-step numbers);
- convolution scratch and DMA double-buffering are not visible in HLO text.

Usage:
  breakdown = hbm_traffic_breakdown(compiled.as_text())
  print(format_breakdown(breakdown))
or from a dump:  python benchmarks/hbm_breakdown.py module.txt
"""

from __future__ import annotations

import json
import re
import sys
from collections import defaultdict

_DTYPE_BYTES = {
    "pred": 1, "s4": 1, "u4": 1, "s8": 1, "u8": 1, "f8e4m3fn": 1, "f8e5m2": 1,
    "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "f32": 4, "s32": 4, "u32": 4,
    "f64": 8, "s64": 8, "u64": 8, "c64": 8, "c128": 16,
}

_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([\d,]*)\]")
_INSTR_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.*)$")
_OPCODE_RE = re.compile(r"\s([a-z][a-z0-9\-]*)\(")
# aliasing / zero-traffic opcodes.
# - bitcast/copy-done are pure same-bytes views: reads resolve to the source.
# - get-tuple-element and tuple are FREE defs with their OWN declared type
#   (a gte's type is the element's shape; a tuple's type sums its
#   components) — charging reads at the view's own size keeps per-shape
#   buckets exact instead of collapsing every element to operand 0.
# - transpose/copy are REAL traffic on TPU; copy-start moves the bytes and
#   copy-done is the view of its result.
_ALIAS_OPS = {"bitcast", "copy-done"}
_FREE_OPS = {"parameter", "constant", "iota", "after-all", "partition-id",
             "replica-id", "get-tuple-element", "tuple"}


def _shape_bytes(type_str: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(type_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def _norm_shape(type_str: str) -> str:
    """'bf16[8,1024,1024,32]{3,2,1,0}' -> 'bf16[8,1024,1024,32]' (tuples keep
    every array component)."""
    parts = [f"{dt}[{dims}]" for dt, dims in _SHAPE_RE.findall(type_str)]
    return "(" + ", ".join(parts) + ")" if len(parts) > 1 else (
        parts[0] if parts else type_str.strip())


def _computation_blocks(hlo_text: str):
    """Yield (computation_name, [instruction lines]) for every computation."""
    lines = hlo_text.splitlines()
    name, block = None, []
    for ln in lines:
        stripped = ln.strip()
        if stripped.endswith("{") and ("=" not in ln.split("(")[0]):
            header = stripped.split("(")[0].strip()
            name = header.replace("ENTRY", "").strip().lstrip("%") or "entry"
            if stripped.startswith("ENTRY"):
                name = "ENTRY " + name
            block = []
        elif stripped == "}" or stripped.startswith("} "):
            if name is not None:
                yield name, block
            name = None
        elif name is not None and "=" in ln:
            block.append(ln)


def _parse_instruction(line: str):
    m = _INSTR_RE.match(line)
    if not m:
        return None
    name, rest = m.group(1), m.group(2)
    om = _OPCODE_RE.search(" " + rest)
    opcode = om.group(1) if om else ""
    # operand region: from the opcode's '(' to its balancing ')'
    operands = []
    if om:
        start = (" " + rest).find(om.group(0)) + len(om.group(0)) - 1
        depth, i, region = 0, start, ""
        rest_p = " " + rest
        while i < len(rest_p):
            c = rest_p[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    region = rest_p[start + 1:i]
                    break
            i += 1
        operands = re.findall(r"%?([\w.\-]+)", region)
    # the type is everything before the opcode match
    type_str = rest if not om else rest[: (" " + rest).find(om.group(0))]
    return name, opcode, type_str, operands


def hbm_traffic_breakdown(hlo_text: str, top: int = 25) -> dict:
    """Parse optimized HLO text -> per-shape traffic table.

    Returns {"total_gb", "buckets": [{shape, traffic_gb, writes, reads,
    n_buffers, ops}], "n_instructions"}."""
    defs: dict = {}        # name -> (shape_str, bytes, opcode)
    alias: dict = {}       # name -> source name
    reads = defaultdict(int)     # name -> top-level read count
    n_instructions = 0

    # sub-computations called by fusions don't touch HBM; while/cond bodies
    # do.  Fusion-called computations are named %fused_computation* /
    # %region* by convention — skip those, keep the rest.
    for comp_name, lines in _computation_blocks(hlo_text):
        is_entry = comp_name.startswith("ENTRY")
        lowered = comp_name.lower()
        if not is_entry and ("fused" in lowered or "region" in lowered
                             or "computation" in lowered):
            continue
        for ln in lines:
            parsed = _parse_instruction(ln)
            if parsed is None:
                continue
            name, opcode, type_str, operands = parsed
            n_instructions += 1
            nbytes = _shape_bytes(type_str)
            if opcode in _ALIAS_OPS and operands:
                src = operands[0]
                alias[name] = alias.get(src, src)
                continue  # views/grouping: no write AND no operand reads —
                # traffic is charged where the aliased buffer is USED
            elif opcode in _FREE_OPS:
                defs[name] = (_norm_shape(type_str), nbytes, opcode)
                continue  # no write charged; reads charged at uses
            else:
                defs[name] = (_norm_shape(type_str), nbytes, opcode)
            for op in operands:
                tgt = alias.get(op, op)
                if tgt in defs:
                    reads[tgt] += 1

    buckets: dict = defaultdict(lambda: dict(
        traffic=0, writes=0, reads=0, n_buffers=0, ops=set()))
    total = 0
    for name, (shape, nbytes, opcode) in defs.items():
        if nbytes == 0:
            continue
        b = buckets[shape]
        wrote = 0 if opcode in _FREE_OPS else 1
        r = reads.get(name, 0)
        b["traffic"] += nbytes * (wrote + r)
        b["writes"] += wrote
        b["reads"] += r
        b["n_buffers"] += 1
        b["ops"].add(opcode)
        total += nbytes * (wrote + r)

    rows = sorted(
        (dict(shape=s, traffic_gb=round(v["traffic"] / 1e9, 3),
              writes=v["writes"], reads=v["reads"], n_buffers=v["n_buffers"],
              ops=sorted(v["ops"]))
         for s, v in buckets.items()),
        key=lambda r: -r["traffic_gb"],
    )
    return dict(total_gb=round(total / 1e9, 3), buckets=rows[:top],
                n_instructions=n_instructions)


def format_breakdown(b: dict, top: int = 15) -> str:
    lines = [f"HBM traffic (static, top-level buffers): {b['total_gb']:.1f} GB "
             f"across {b['n_instructions']} instructions"]
    lines.append(f"{'GB':>8}  {'w':>4} {'r':>5} {'bufs':>5}  shape / ops")
    for row in b["buckets"][:top]:
        lines.append(
            f"{row['traffic_gb']:8.2f}  {row['writes']:4d} {row['reads']:5d} "
            f"{row['n_buffers']:5d}  {row['shape']}  "
            f"[{','.join(row['ops'][:4])}]")
    return "\n".join(lines)


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print(__doc__)
        return 1
    with open(argv[0]) as f:
        text = f.read()
    b = hbm_traffic_breakdown(text)
    print(format_breakdown(b, top=30))
    print(json.dumps(b))
    return 0


if __name__ == "__main__":
    sys.exit(main())
