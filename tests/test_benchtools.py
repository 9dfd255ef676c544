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

    def test_vmem_prefetch_is_charged_once(self):
        # copy-start HBM -> S(1) (VMEM): one HBM read of the source; the
        # consumer's read of the prefetched buffer is free
        hlo = """
HloModule test

ENTRY %main (p.1: f32[128,128]) -> f32[128,128] {
  %p.1 = f32[128,128]{1,0} parameter(0)
  %copy-start.1 = (f32[128,128]{1,0:S(1)}, f32[128,128]{1,0}, u32[]{:S(2)}) copy-start(%p.1)
  %copy-done.1 = f32[128,128]{1,0:S(1)} copy-done(%copy-start.1)
  ROOT %exp.1 = f32[128,128]{1,0} exponential(%copy-done.1)
}
"""
        b = hbm_traffic_breakdown(hlo)
        total = b["total_gb"] * 1e9
        # p.1 read once by the copy (64KB) + exp writes its HBM output
        # (64KB); the VMEM dest write and the copy-done read are free
        assert abs(total - 2 * 128 * 128 * 4) < 1e3  # total_gb is rounded to 1 KB

    def test_dynamic_slice_charges_slice_bytes(self):
        hlo = """
HloModule test

ENTRY %main (p.1: f32[64,256], p.2: s32[]) -> f32[1,256] {
  %p.1 = f32[64,256]{1,0} parameter(0)
  %p.2 = s32[]{:S(2)} parameter(1)
  %c.0 = s32[]{:S(2)} constant(0)
  ROOT %dynamic-slice.1 = f32[1,256]{1,0} dynamic-slice(%p.1, %p.2, %c.0), dynamic_slice_sizes={1,256}
}
"""
        b = hbm_traffic_breakdown(hlo)
        total = b["total_gb"] * 1e9
        # slice read (1KB) + slice write (1KB), NOT a 64KB full-buffer read
        assert abs(total - 2 * 256 * 4) < 1e3  # total_gb is rounded to 1 KB

    def test_dynamic_update_slice_is_in_place(self):
        hlo = """
HloModule test

ENTRY %main (p.1: f32[64,256], p.3: f32[1,256]) -> f32[64,256] {
  %p.1 = f32[64,256]{1,0} parameter(0)
  %p.3 = f32[1,256]{1,0} parameter(1)
  %c.0 = s32[]{:S(2)} constant(0)
  ROOT %dynamic-update-slice.1 = f32[64,256]{1,0} dynamic-update-slice(%p.1, %p.3, %c.0, %c.0)
}
"""
        b = hbm_traffic_breakdown(hlo)
        total = b["total_gb"] * 1e9
        # update read (1KB) + update write (1KB); no 64KB rewrite of p.1
        assert abs(total - 2 * 256 * 4) < 1e3  # total_gb is rounded to 1 KB

    def test_dynamic_slice_vmem_result_still_charges_slice_read(self):
        """A dynamic-slice whose RESULT lands in VMEM (S(1)) still reads
        only the slice extent from the HBM source — `hbm_out or None`
        collapsing 0 used to fall back to a FULL source-buffer read."""
        hlo = """
HloModule test

ENTRY %main (p.1: f32[64,256], p.2: s32[]) -> f32[1,256] {
  %p.1 = f32[64,256]{1,0} parameter(0)
  %p.2 = s32[]{:S(2)} parameter(1)
  %c.0 = s32[]{:S(2)} constant(0)
  ROOT %dynamic-slice.1 = f32[1,256]{1,0:S(1)} dynamic-slice(%p.1, %p.2, %c.0), dynamic_slice_sizes={1,256}
}
"""
        b = hbm_traffic_breakdown(hlo)
        total = b["total_gb"] * 1e9
        # slice read (1KB) only: the VMEM result write is free, and the
        # read must NOT be the 64KB source buffer
        assert abs(total - 256 * 4) < 1e3  # total_gb is rounded to 1 KB

    def test_dus_vmem_update_still_charges_hbm_write(self):
        """A dynamic-update-slice whose UPDATE operand is VMEM-resident
        still writes the update extent into the HBM destination — deriving
        the write from the update's per-consumer READ bytes charged 0."""
        hlo = """
HloModule test

ENTRY %main (p.1: f32[64,256], p.3: f32[1,256]) -> f32[64,256] {
  %p.1 = f32[64,256]{1,0} parameter(0)
  %p.3 = f32[1,256]{1,0:S(1)} parameter(1)
  %c.0 = s32[]{:S(2)} constant(0)
  ROOT %dynamic-update-slice.1 = f32[64,256]{1,0} dynamic-update-slice(%p.1, %p.3, %c.0, %c.0)
}
"""
        b = hbm_traffic_breakdown(hlo)
        total = b["total_gb"] * 1e9
        # update write into HBM dest (1KB); the VMEM update read is free
        assert abs(total - 256 * 4) < 1e3  # total_gb is rounded to 1 KB

    def test_async_slice_charges_result_bytes(self):
        hlo = """
HloModule test

ENTRY %main (p.1: f32[8,1024]) -> f32[2,1024] {
  %p.1 = f32[8,1024]{1,0} parameter(0)
  %slice-start.1 = ((f32[8,1024]{1,0}), f32[2,1024]{1,0:S(1)}, s32[]{:S(2)}) async-start(%p.1), calls=%async_computation.1
  %slice-done.1 = f32[2,1024]{1,0:S(1)} async-done(%slice-start.1)
  ROOT %neg.1 = f32[2,1024]{1,0} negate(%slice-done.1)
}
"""
        b = hbm_traffic_breakdown(hlo)
        total = b["total_gb"] * 1e9
        # async slice reads 2x1024 floats from p.1 into VMEM (8KB) + the
        # negate's HBM output write (8KB); the done-view read is free
        assert abs(total - 2 * 2 * 1024 * 4) < 1e3  # total_gb is rounded to 1 KB


class TestBenchCommon:
    """benchmarks/common.py — the shared plumbing every benchmark script
    imports (cache setup, bf16 pre-cast, median timing)."""

    def test_bf16_params_casts_only_f32(self):
        from benchmarks.common import bf16_params

        tree = {"w": jnp.ones((2, 2), jnp.float32),
                "i": jnp.ones((2,), jnp.int32),
                "b": jnp.ones((2,), jnp.bfloat16),
                "s": "not-an-array"}
        out = bf16_params(tree)
        assert out["w"].dtype == jnp.bfloat16
        assert out["i"].dtype == jnp.int32
        assert out["b"].dtype == jnp.bfloat16
        assert out["s"] == "not-an-array"

    def test_timed_median_returns_positive_seconds(self):
        from benchmarks.common import timed_median

        f = jax.jit(lambda x: (x * 2.0, x + 1.0))  # tuple output: barrier
        sec = timed_median(f, jnp.ones((8, 8)), calls=2, reps=3)
        assert sec > 0.0

    def test_setup_cache_tiny_forces_cpu_and_test_cache(self):
        # conftest already forces CPU; setup_cache(tiny=True) must agree
        # with the test suite's cache dir so smoke runs share compiles
        from benchmarks.common import setup_cache

        cache = setup_cache(tiny=True, min_compile_secs=0.3)
        assert cache.endswith("tests/.jax_cache")
        assert jax.config.jax_platforms == "cpu"
