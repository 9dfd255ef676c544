"""Static per-buffer HBM-traffic breakdown of a compiled XLA program.

The roofline bound for a bandwidth-bound program is (bytes moved)/(HBM BW);
XLA's ``cost_analysis`` reports ONE total for bytes moved — and counts every
operand of every op, i.e. double-counts producer->consumer bytes inside
fused kernels that never leave VMEM.  This tool parses the optimized HLO
text instead and charges only bytes that actually cross HBM:

- every top-level instruction writes its output once and reads each operand
  once (the entry computation after fusion IS the kernel schedule);
- **memory spaces are honoured**: TPU HLO layouts carry ``S(1)`` (VMEM) /
  ``S(2)`` (SMEM) annotations.  A buffer placed on-chip charges NOTHING on
  reads or writes — e.g. the weight stacks that XLA prefetches to VMEM via
  ``copy-start`` pay one HBM read at the copy and are then free to every
  consumer.  (Ignoring this overcounted the r3 patch step ~3x.)
- **in-place / slicing ops charge slice bytes, not buffer bytes**:
  ``dynamic-slice`` reads only its output's extent from the source;
  ``dynamic-update-slice`` updates in place (write = update bytes, no
  full-buffer rewrite); async ``slice-start``/``async-done`` pairs charge
  the slice once at the start op.
- aliasing ops (bitcast) resolve to their source buffer; pure views with
  their own declared type+space (get-tuple-element, tuple, copy-done,
  async-done) are free defs — their consumers charge that view's own
  HBM-resident bytes.

Traffic is bucketed by buffer SHAPE, which is what makes the table
actionable: ``bf16[8,1024,1024,32]`` is "the 1024^2 synthesis activations",
``f32[8,256,256,64]`` is "the fp32 VGG conv1 taps", and so on.

Limitations (documented, acceptable for kernel-schedule analysis):
- ``while`` bodies are parsed and charged once (a scanned loop's
  per-iteration traffic multiplies by trip count — use unrolled or stepwise
  programs for per-step numbers); the while op itself charges nothing (its
  state tuple aliases in place);
- convolution scratch and DMA double-buffering are not visible in HLO text;
- the result is a schedule-level ESTIMATE: validate wall-time conclusions
  against the device trace (benchmarks/profile_whitebox.py).

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

# shape with optional layout braces: 'bf16[8,32]{1,0:T(8,128)S(1)}'
_COMP_RE = re.compile(r"([a-z0-9]+)\[([\d,]*)\](?:\{([^}]*)\})?")
_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([\d,]*)\]")
_INSTR_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.*)$")
_OPCODE_RE = re.compile(r"\s([a-z][a-z0-9\-]*)\(")
# pure aliases: reads resolve to the source buffer.
_ALIAS_OPS = {"bitcast"}
# free defs with their OWN declared type+space — no write; consumers charge
# the view's own HBM-resident bytes.  copy-done / async-done are the views
# of their start ops' results (the data movement is charged at the start).
_FREE_OPS = {"parameter", "constant", "iota", "after-all", "partition-id",
             "replica-id", "get-tuple-element", "tuple", "copy-done",
             "async-done", "while"}
# data-movement starts with special charging rules (see _charge below)
_START_OPS = {"copy-start", "async-start"}


def _components(type_str: str):
    """[(bytes, on_chip)] for every array component of a (tuple) type."""
    comps = []
    for dt, dims, layout in _COMP_RE.findall(type_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        comps.append((n * _DTYPE_BYTES[dt], "S(" in (layout or "")))
    return comps


def _hbm_bytes(type_str: str) -> int:
    """Bytes of the HBM-resident components only."""
    return sum(b for b, onchip in _components(type_str) if not onchip)


def _shape_bytes(type_str: str) -> int:
    """Total bytes regardless of memory space (kept for tests/compat)."""
    return sum(b for b, _ in _components(type_str))


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
    """Parse optimized HLO text -> per-shape HBM traffic table.

    Returns {"total_gb", "buckets": [{shape, traffic_gb, writes, reads,
    n_buffers, ops}], "n_instructions"}."""
    # name -> (norm_shape, bytes a consumer read transfers from HBM,
    #          write bytes charged at def, opcode)
    defs: dict = {}
    alias: dict = {}             # name -> source name
    reads_n = defaultdict(int)   # name -> top-level read count
    reads_b = defaultdict(int)   # name -> total HBM read bytes charged
    n_instructions = 0

    def charge_read(op_name: str, nbytes: int | None = None) -> None:
        tgt = alias.get(op_name, op_name)
        if tgt not in defs:
            return
        per_read = defs[tgt][1]
        if per_read <= 0:
            return  # on-chip (VMEM/SMEM) or zero-size buffer: free reads
        reads_n[tgt] += 1
        reads_b[tgt] += per_read if nbytes is None else min(nbytes, per_read)

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
            comps = _components(type_str)
            hbm_out = sum(b for b, onchip in comps if not onchip)
            if opcode in _ALIAS_OPS and operands:
                src = operands[0]
                alias[name] = alias.get(src, src)
                continue
            if opcode in _FREE_OPS:
                # own type+space view; no write, no operand traffic.  (while:
                # its state tuple aliases in place — the body, parsed as its
                # own computation, carries the real per-iteration traffic.)
                defs[name] = (_norm_shape(type_str), hbm_out, 0, opcode)
                continue
            if opcode == "copy-start":
                # tuple (dest, src-alias, context): the copy reads the
                # operand and writes the dest component — each charged only
                # if HBM-resident.  This is how XLA spells VMEM prefetch.
                dest_b = (comps[0][0] if comps and not comps[0][1] else 0)
                defs[name] = (_norm_shape(type_str), dest_b, dest_b, opcode)
                if operands:
                    charge_read(operands[0])
                continue
            if opcode == "async-start":
                # tuple ((operands...), result, scratch): an async slice /
                # wrapped op.  It moves RESULT bytes out of the source —
                # charge that as the operand read; write only if the result
                # lands in HBM (usually it lands in VMEM: S(1)).
                res_b, res_onchip = comps[-2] if len(comps) >= 2 else (0, True)
                w = 0 if res_onchip else res_b
                defs[name] = (_norm_shape(type_str), w, w, opcode)
                if operands:
                    charge_read(operands[0], res_b)
                continue
            if opcode == "dynamic-slice":
                # reads only the slice extent from the source buffer — the
                # extent is the result's TOTAL bytes regardless of where the
                # result lands (an S(1)/VMEM result must not fall back to a
                # full-source read via `hbm_out or None` collapsing 0)
                extent = _shape_bytes(type_str)
                defs[name] = (_norm_shape(type_str), hbm_out, hbm_out, opcode)
                if operands and extent:
                    charge_read(operands[0], extent)
                for op in operands[1:]:
                    charge_read(op)
                continue
            if opcode == "dynamic-update-slice":
                # in place: write = the update operand's EXTENT into the dest
                # (zero only if the dest itself is on-chip); the big operand
                # aliases through (no full-buffer rewrite, no full-buffer
                # read).  The extent comes from the update's shape — its
                # per-consumer read bytes would be 0 for a VMEM-resident
                # update even though the HBM dest is still written.
                upd = operands[1] if len(operands) > 1 else None
                upd_t = alias.get(upd, upd)
                upd_b = (_shape_bytes(defs[upd_t][0]) if upd_t in defs
                         else hbm_out)
                defs[name] = (_norm_shape(type_str), hbm_out,
                              upd_b if hbm_out else 0, opcode)
                for op in operands[1:]:
                    charge_read(op)
                continue
            # ordinary kernel: write the HBM components of the output, read
            # each operand's HBM bytes
            defs[name] = (_norm_shape(type_str), hbm_out, hbm_out, opcode)
            for op in operands:
                charge_read(op)

    buckets: dict = defaultdict(lambda: dict(
        traffic=0, writes=0, reads=0, n_buffers=0, ops=set()))
    total = 0
    for name, (shape, _read_b, write_b, opcode) in defs.items():
        rb = reads_b.get(name, 0)
        if write_b == 0 and rb == 0:
            continue
        b = buckets[shape]
        b["traffic"] += write_b + rb
        b["writes"] += 1 if write_b else 0
        b["reads"] += reads_n.get(name, 0)
        b["n_buffers"] += 1
        b["ops"].add(opcode)
        total += write_b + rb

    rows = sorted(
        (dict(shape=s, traffic_gb=round(v["traffic"] / 1e9, 6),
              writes=v["writes"], reads=v["reads"], n_buffers=v["n_buffers"],
              ops=sorted(v["ops"]))
         for s, v in buckets.items()),
        key=lambda r: -r["traffic_gb"],
    )
    return dict(total_gb=round(total / 1e9, 6), buckets=rows[:top],
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
