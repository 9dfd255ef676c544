"""Width-packed Pallas tail-conv correctness (ops/pallas_conv.py).

Interpret mode on CPU: the kernels (forward, input-grad, weight-grad) must
match XLA's conv + autodiff exactly.  These are the hot synthesis-tail convs
of the whitebox/fusion attacks (docs/DESIGN.md §9); rosinality
ModulatedConv2d 3x3 path parity is covered by the modconv tests — here we
pin the packed kernels against `lax.conv_general_dilated` directly.
"""

import jax
import jax.numpy as jnp
import pytest
from jax import lax

from tpufusion.ops import pallas_conv as pc


@pytest.fixture(autouse=True)
def _interpret():
    pc.set_interpret(True)
    yield
    pc.set_interpret(False)


def _ref_conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


CASES = [(1, 24, 8, 32), (1, 24, 4, 64), (2, 16, 8, 32)]


class TestWidthPackedConv:
    @pytest.mark.parametrize("n,h,w,c", CASES)
    def test_forward_matches_xla(self, n, h, w, c):
        x = jax.random.normal(jax.random.key(0), (n, h, w, c), jnp.float32)
        wt = jax.random.normal(jax.random.key(1), (3, 3, c, c)) * 0.1
        y = pc.conv3x3_wp(x, wt)
        y_ref = _ref_conv(x, wt)
        assert jnp.allclose(y, y_ref, atol=1e-4, rtol=1e-4)

    @pytest.mark.parametrize("n,h,w,c", CASES[:2])
    def test_grads_match_xla(self, n, h, w, c):
        x = jax.random.normal(jax.random.key(0), (n, h, w, c), jnp.float32)
        wt = jax.random.normal(jax.random.key(1), (3, 3, c, c)) * 0.1
        g = jax.random.normal(jax.random.key(2), (n, h, w, c), jnp.float32)

        dx, dw = jax.grad(
            lambda a, b: jnp.sum(pc.conv3x3_wp(a, b) * g), (0, 1))(x, wt)
        dxr, dwr = jax.grad(
            lambda a, b: jnp.sum(_ref_conv(a, b) * g), (0, 1))(x, wt)
        assert jnp.allclose(dx, dxr, atol=1e-4, rtol=1e-4)
        assert jnp.allclose(dw, dwr, atol=1e-4, rtol=1e-4)

    def test_supported_predicate(self):
        assert pc._supported((8, 1024, 1024, 32), (3, 3, 32, 32))
        assert pc._supported((8, 512, 512, 64), (3, 3, 64, 64))
        # wrong kernel size / channel mismatch / unpackable width
        assert not pc._supported((8, 512, 512, 64), (1, 1, 64, 64))
        assert not pc._supported((8, 512, 512, 64), (3, 3, 64, 32))
        assert not pc._supported((8, 64, 6, 32), (3, 3, 32, 32))
        assert not pc._supported((8, 256, 256, 128), (3, 3, 128, 128))

    def test_compiled_mode_gates_dtype(self):
        """Compiled kernels are VMEM-sized for <=2-byte dtypes: the
        dispatcher predicate must reject f32 (fall back to XLA conv) and a
        direct call must raise clearly, not fail at on-device compile."""
        pc.set_interpret(False)
        try:
            shp, wshp = (8, 1024, 1024, 32), (3, 3, 32, 32)
            assert not pc._supported(shp, wshp, jnp.float32)
            assert pc._supported(shp, wshp, jnp.bfloat16)
            with pytest.raises(ValueError, match="VMEM-sized"):
                pc.conv3x3_wp(jnp.zeros((1, 8, 8, 32), jnp.float32),
                              jnp.zeros((3, 3, 32, 32), jnp.float32))
        finally:
            pc.set_interpret(True)
        # interpret mode has no VMEM -> f32 allowed (this file's tests)
        assert pc._supported((8, 1024, 1024, 32), (3, 3, 32, 32),
                             jnp.float32)

    def test_supported_width_cap(self):
        # packed width > 256 exceeds the kernels' VMEM sizing
        assert not pc._supported((8, 2048, 2048, 32), (3, 3, 32, 32))

    def test_pack_unpack_roundtrip_adjoint(self):
        # <dWk, pack(W)> == <unpack(dWk), W> — pack/unpack are adjoints
        c = 32
        wt = jax.random.normal(jax.random.key(3), (3, 3, c, c))
        dwk = jax.random.normal(jax.random.key(4), (3, 3, 128, 128))
        lhs = jnp.sum(dwk * pc.pack_weights(wt))
        rhs = jnp.sum(pc.unpack_dw(dwk, c, jnp.float32) * wt)
        assert jnp.allclose(lhs, rhs, rtol=1e-5)

    def test_vmap_composes(self):
        # vmap_whitebox maps the attack step over the batch with the model
        # params broadcast — the kernel must batch correctly under vmap
        n, h, w, c = 1, 16, 8, 32
        xs = jax.random.normal(jax.random.key(0), (3, n, h, w, c))
        wt = jax.random.normal(jax.random.key(1), (3, 3, c, c)) * 0.1
        g = jax.random.normal(jax.random.key(2), (3, n, h, w, c))

        def tot(fn):
            return lambda a, b: jnp.sum(
                jax.vmap(fn, in_axes=(0, None))(a, b) * g)

        y = jax.vmap(pc.conv3x3_wp, in_axes=(0, None))(xs, wt)
        yr = jax.vmap(_ref_conv, in_axes=(0, None))(xs, wt)
        assert jnp.allclose(y, yr, atol=1e-4, rtol=1e-4)
        dx, dw = jax.grad(tot(pc.conv3x3_wp), (0, 1))(xs, wt)
        dxr, dwr = jax.grad(tot(_ref_conv), (0, 1))(xs, wt)
        assert jnp.allclose(dx, dxr, atol=1e-4, rtol=1e-4)
        assert jnp.allclose(dw, dwr, atol=1e-4, rtol=1e-4)

    def test_modconv_wp_path_matches_default(self):
        from tpufusion.ops import modconv

        n, h, w, c = 1, 24, 8, 32
        x = jax.random.normal(jax.random.key(5), (n, h, w, c), jnp.float32)
        wt = jax.random.normal(jax.random.key(6), (3, 3, c, c))
        s = jax.random.normal(jax.random.key(7), (n, c)) * 0.2 + 1.0
        y_def = modconv.modulated_conv2d(x, wt, s)
        modconv.set_wp_tail(True)
        try:
            y_wp = modconv.modulated_conv2d(x, wt, s)
        finally:
            modconv.set_wp_tail(False)
        assert jnp.allclose(y_def, y_wp, atol=1e-4, rtol=1e-4)
