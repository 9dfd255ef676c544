"""Benchmark tooling tests — the HBM-traffic HLO parser must keep working
(it feeds the roofline accounting in docs/DESIGN.md §9 and the bench
artifact)."""

import jax
import jax.numpy as jnp

from benchmarks.hbm_breakdown import (
    _parse_instruction,
    _shape_bytes,
    format_breakdown,
    hbm_traffic_breakdown,
)


class TestHBMBreakdown:
    def test_shape_bytes(self):
        assert _shape_bytes("f32[8,16]{1,0}") == 8 * 16 * 4
        assert _shape_bytes("bf16[2,4]") == 2 * 4 * 2
        assert _shape_bytes("(f32[2]{0}, s32[3])") == 2 * 4 + 3 * 4
        assert _shape_bytes("token[]") == 0

    def test_parse_instruction(self):
        name, opcode, type_str, operands = _parse_instruction(
            "  %fusion.3 = bf16[8,32]{1,0} fusion(%p.1, %bitcast.2), "
            "kind=kLoop, calls=%fused_computation.1")
        assert name == "fusion.3"
        assert opcode == "fusion"
        assert "bf16[8,32]" in type_str
        assert "p.1" in operands and "bitcast.2" in operands

    def test_parses_real_compiled_program(self):
        def f(x, w):
            y = jnp.tanh(x @ w)
            return jnp.sum(y * y), y

        x = jnp.zeros((64, 128))
        w = jnp.zeros((128, 256))
        compiled = jax.jit(f).lower(x, w).compile()
        b = hbm_traffic_breakdown(compiled.as_text())
        assert b["n_instructions"] > 0
        assert b["total_gb"] >= 0
        assert b["buckets"], "no traffic buckets parsed"
        # the parameter buffers must appear somewhere in the table
        shapes = " ".join(r["shape"] for r in b["buckets"])
        assert "f32[64,128]" in shapes or "f32[128,256]" in shapes
        text = format_breakdown(b)
        assert "HBM traffic" in text

    def test_alias_resolution_and_free_ops(self):
        hlo = """
HloModule test

ENTRY %main (p.1: f32[4,4]) -> f32[4,4] {
  %p.1 = f32[4,4]{1,0} parameter(0)
  %bitcast.1 = f32[4,4]{1,0} bitcast(%p.1)
  ROOT %add.1 = f32[4,4]{1,0} add(%bitcast.1, %bitcast.1)
}
"""
        b = hbm_traffic_breakdown(hlo)
        (row,) = b["buckets"]
        assert row["shape"] == "f32[4,4]"
        # add writes its output once; the two bitcast reads resolve to p.1
        assert row["writes"] == 1
        assert row["reads"] == 2
