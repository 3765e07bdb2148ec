"""Row-band one-hot-matmul DCNv2 kernel (kernels/dcn_rowband.py).

Interpret-mode numerics run on CPU every time (small shapes, R=2):
forward vs the y-clamped-offset XLA oracle, and the FUSED Pallas
backward kernel vs XLA autodiff of the oracle — grads for x, offsets,
masks, weights, bias (incl. the y-clamp saturation pass-through, since
the offset scale pushes past R).  Gating tests cover the env switch;
the real-chip compile probe is exercised by
experiments/bench_dcn_rowband.py on TPU.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from centerpoly_tpu.kernels.dcn_rowband import (
    DEFAULT_MAX_OFFSET, _clamp_y, deform_conv2d_rowband,
    deform_conv2d_rowband_ref, rowband_supported)


def _inputs(b=1, h=8, w=8, c=8, cout=8, seed=0, scale=1.5):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    off = jnp.asarray(rng.randn(b, h, w, 18) * scale, jnp.float32)
    mask = jax.nn.sigmoid(jnp.asarray(rng.randn(b, h, w, 9), jnp.float32))
    wt = jnp.asarray(rng.randn(3, 3, c, cout) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.randn(cout), jnp.float32)
    return x, off, mask, wt, bias


class TestGating:
    def test_cpu_not_supported(self):
        assert rowband_supported(16, 16, 8, 8) is False

    def test_mode_parsing(self, monkeypatch):
        from centerpoly_tpu.models.deform_conv import rowband_dcn_mode
        monkeypatch.setenv("CENTERPOLY_PALLAS_DCN", "auto")
        assert rowband_dcn_mode(8, 8, 8, 8) == (False, None)
        monkeypatch.setenv("CENTERPOLY_PALLAS_DCN", "rowband")
        use, r = rowband_dcn_mode(8, 8, 8, 8)
        assert r == DEFAULT_MAX_OFFSET and use is False  # cpu backend
        monkeypatch.setenv("CENTERPOLY_PALLAS_DCN", "rowband:3")
        assert rowband_dcn_mode(8, 8, 8, 8)[1] == 3
        monkeypatch.setenv("CENTERPOLY_PALLAS_DCN", "rowband:bogus")
        with pytest.warns(UserWarning):
            assert rowband_dcn_mode(8, 8, 8, 8)[1] == DEFAULT_MAX_OFFSET

    def test_module_passes_raw_offsets_to_kernel(self, monkeypatch):
        """The kernel owns the y-clamp (and its 0.5 saturation
        tie-gradient); DCNv2 must NOT pre-clamp, or the composed
        gradient at the bound halves to 0.25 (round-3 advisor)."""
        from centerpoly_tpu.kernels import dcn_rowband as rb
        from centerpoly_tpu.models import deform_conv as dc

        seen = {}

        def spy(x, off, mask, wt, bias, r):
            seen["off_max"] = float(jnp.max(jnp.abs(off)))
            # stand in with the XLA oracle: the Pallas kernel itself
            # can't compile on the CPU test backend
            return rb.deform_conv2d_rowband_ref(x, off, mask, wt, bias, r)

        monkeypatch.setattr(rb, "deform_conv2d_rowband", spy)
        monkeypatch.setattr(dc, "rowband_dcn_mode",
                            lambda *a, **k: (True, 2))
        m = dc.DCNv2(8)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 16, 8),
                        jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        # push the offset-conv bias way past R so a pre-clamp would be
        # visible at the kernel boundary
        v = jax.tree.map(lambda a: a, v)  # unfreeze-safe copy
        params = jax.tree_util.tree_map(lambda a: a, v["params"])
        bias = params["conv_offset_mask"]["bias"]
        params["conv_offset_mask"]["bias"] = bias.at[:18].set(7.0)
        out = m.apply({"params": params}, x)
        assert out.shape == (1, 8, 16, 8)
        assert seen["off_max"] > 2.0 + 1e-3, (
            "DCNv2 pre-clamped the offsets it handed the rowband kernel")

    def test_module_rowband_fallback_clamps(self, monkeypatch):
        """In rowband mode on CPU the module must run the XLA path WITH
        the y-only clamp — same math the kernel would compute."""
        from centerpoly_tpu.models.deform_conv import DCNv2
        m = DCNv2(8)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 16, 8),
                        jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        monkeypatch.setenv("CENTERPOLY_PALLAS_DCN", "rowband:2")
        out = m.apply(v, x)
        assert out.shape == (1, 8, 16, 8)
        # zero-init offset conv -> offsets are 0, clamp is a no-op ->
        # must equal the plain path exactly
        monkeypatch.setenv("CENTERPOLY_PALLAS_DCN", "0")
        ref = m.apply(v, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)


class TestClampY:
    def test_y_only(self):
        off = jnp.asarray(
            np.random.RandomState(0).randn(2, 4, 4, 18) * 5, jnp.float32)
        c = _clamp_y(off, 2.0)
        y, x = np.asarray(c[..., 0::2]), np.asarray(c[..., 1::2])
        assert y.min() >= -2.0 and y.max() <= 2.0
        np.testing.assert_array_equal(x, np.asarray(off[..., 1::2]))


class TestInterpretNumerics:
    @pytest.mark.parametrize("scale", [0.8, 3.0])  # within / beyond R
    def test_forward_matches_oracle(self, scale):
        x, off, mask, wt, bias = _inputs(b=2, h=8, w=16, scale=scale)
        out = deform_conv2d_rowband(x, off, mask, wt, bias, 2, True)
        ref = deform_conv2d_rowband_ref(x, off, mask, wt, bias, 2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_forward_edge_offsets(self):
        """Samples pushed off every image edge must zero-pad exactly."""
        x, off, mask, wt, bias = _inputs(h=6, w=6, scale=0.0)
        off = off + 12.0  # everything off the bottom-right
        out = deform_conv2d_rowband(x, off, mask, wt, bias, 2, True)
        ref = deform_conv2d_rowband_ref(x, off, mask, wt, bias, 2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_x_offsets_exact_beyond_r(self):
        """x-offsets > R must NOT be clamped (only y is banded)."""
        x, off, mask, wt, bias = _inputs(h=6, w=16, scale=0.0)
        # y small, x large: sample 5 columns away with R=2
        off = off.at[..., 0::2].set(0.3).at[..., 1::2].set(5.2)
        out = deform_conv2d_rowband(x, off, mask, wt, bias, 2, True)
        from centerpoly_tpu.models.deform_conv import deform_conv2d
        ref = deform_conv2d(x, off, mask, wt, bias)  # unclamped oracle
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_grads_match_oracle_autodiff(self):
        x, off, mask, wt, bias = _inputs(b=2, h=8, w=16, scale=3.0)

        def loss(fn):
            return lambda *a: jnp.sum(fn(*a) ** 2)

        g_k = jax.grad(loss(
            lambda *a: deform_conv2d_rowband(*a, 2, True)),
            argnums=(0, 1, 2, 3, 4))(x, off, mask, wt, bias)
        g_r = jax.grad(loss(
            lambda *a: deform_conv2d_rowband_ref(*a, 2)),
            argnums=(0, 1, 2, 3, 4))(x, off, mask, wt, bias)
        for a, b in zip(g_k, g_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-4)

    def test_grads_at_integer_offsets(self):
        """Zero / integer offsets: the hat derivative must use the
        one-sided floor/frac convention (-1 on [0,1), +1 on [-1,0)).
        -sign(ay) is 0 at integer dy — i.e. at zero offset init, where
        a wrong kernel silently freezes every y-offset forever
        (regression: round-3 review finding)."""
        x, off, mask, wt, bias = _inputs(b=1, h=6, w=8)

        def loss(fn):
            return lambda o: jnp.sum(fn(x, o, mask, wt, bias) ** 2)

        k = loss(lambda *a: deform_conv2d_rowband(*a, 2, True))
        r = loss(lambda *a: deform_conv2d_rowband_ref(*a, 2))
        zero = jnp.zeros_like(off)
        ints = jnp.asarray(
            np.random.RandomState(3).randint(-1, 2, off.shape),
            jnp.float32)
        for o in (zero, ints):
            g_k, g_r = jax.grad(k)(o), jax.grad(r)(o)
            assert float(jnp.max(jnp.abs(g_r))) > 0.1  # non-degenerate
            np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r),
                                       rtol=1e-3, atol=1e-4)

    def test_wider_channels(self):
        """C != Cout and a wider-than-sublane channel count."""
        x, off, mask, wt, bias = _inputs(h=4, w=8, c=16, cout=24)
        out = deform_conv2d_rowband(x, off, mask, wt, bias, 2, True)
        ref = deform_conv2d_rowband_ref(x, off, mask, wt, bias, 2)
        assert out.shape == (1, 4, 8, 24)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


class TestLanePacking:
    """P = 128//W lane packing (P rows per grid step) must be a pure
    internal optimization: bit-identical outputs and grads vs the
    forced-unpacked kernel, including the cross-half edge cases."""

    def test_pack_factor(self):
        from centerpoly_tpu.kernels.dcn_rowband import _pack_factor
        assert _pack_factor(256, 128) == 1
        assert _pack_factor(256, 64) == 2
        assert _pack_factor(256, 32) == 4
        assert _pack_factor(6, 64) == 2    # halved until it divides z
        assert _pack_factor(5, 32) == 1
        assert _pack_factor(256, 200) == 1

    def test_pack_roundtrip(self):
        from centerpoly_tpu.kernels.dcn_rowband import (_pack_lanes,
                                                        _unpack_lanes)
        a = jnp.arange(4 * 3 * 8, dtype=jnp.float32).reshape(4, 3, 8)
        p = _pack_lanes(a, 2)
        assert p.shape == (2, 3, 16)
        # row q of each pair occupies lane half [q*8, (q+1)*8)
        np.testing.assert_array_equal(np.asarray(p[0, :, :8]),
                                      np.asarray(a[0]))
        np.testing.assert_array_equal(np.asarray(p[0, :, 8:]),
                                      np.asarray(a[1]))
        np.testing.assert_array_equal(np.asarray(_unpack_lanes(p, 2)),
                                      np.asarray(a))

    @pytest.mark.parametrize("scale", [0.8, 3.0])
    def test_packed_equals_unpacked(self, scale, monkeypatch):
        # w=16 -> P=8 on the auto path; the edge pixels of every half
        # exercise the cross-half corner masking
        x, off, mask, wt, bias = _inputs(b=2, h=8, w=16, scale=scale)

        def run():
            return deform_conv2d_rowband(x, off, mask, wt, bias, 2, True)

        def grads():
            return jax.grad(
                lambda *a: jnp.sum(
                    deform_conv2d_rowband(*a, 2, True) ** 2),
                argnums=(0, 1, 2, 3, 4))(x, off, mask, wt, bias)

        out_p, g_p = run(), grads()
        monkeypatch.setenv("CENTERPOLY_ROWBAND_PACK", "0")
        out_u, g_u = run(), grads()
        # Tolerance justification (diagnosed 2026-08-19, round 5): the
        # packed contractions reduce over 128 lanes instead of 16 with
        # different f32 partial-sum blocking; measured vs the oracle's
        # autodiff, packed grads deviate <= 1.6e-4 ABSOLUTE (unpacked
        # <= 6e-5 — same noise, different blocking), and the worst
        # "relative" offenders are y-offset grads, which lane packing
        # (an x-axis transform) cannot touch.  Genuine cross-half
        # leakage would be O(1) absolute; test_packed_grads_match_oracle
        # below pins that case at tight ABSOLUTE tolerance.  So: rtol
        # loose (cancellation-prone elements), atol at 4x the measured
        # noise ceiling.
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_u),
                                   rtol=1e-4, atol=1e-5)
        for a, b in zip(g_p, g_u):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=6e-4)

    def test_packed_grads_match_oracle_at_half_boundaries(self):
        """Leak detector for the loosened packed-vs-unpacked tolerance
        above: x-offsets crafted so sample columns cross packed lane
        halves exactly (x0+1 into the next half at the right edge, x0
        below at the left edge).  A cross-half leak of the exact-x
        one-hot would be O(1) absolute in the output and grads; f32
        reduction-order noise measured <= 1.6e-4 — assert ABSOLUTE
        tolerance in between."""
        x, off, mask, wt, bias = _inputs(b=2, h=8, w=16, scale=0.0)
        off = off.at[..., 0::2].set(0.0)
        off = off.at[..., 1::2].set(0.0)
        off = off.at[:, :, 15, 1::2].set(0.6)   # right-edge crossing
        off = off.at[:, :, 0, 1::2].set(-0.6)   # left-edge crossing
        off = off.at[:, :, 14, 1::2].set(1.7)   # x0+1 == 16 for kx=0

        def gr(fn):
            return jax.grad(lambda *a: jnp.sum(fn(*a) ** 2),
                            argnums=(0, 1, 2, 3, 4))(x, off, mask, wt,
                                                     bias)

        out_o = deform_conv2d_rowband_ref(x, off, mask, wt, bias, 2)
        out_p = deform_conv2d_rowband(x, off, mask, wt, bias, 2, True)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_o),
                                   rtol=0, atol=1e-3)
        g_o = gr(lambda *a: deform_conv2d_rowband_ref(*a, 2))
        g_p = gr(lambda *a: deform_conv2d_rowband(*a, 2, True))
        for o, p in zip(g_o, g_p):
            np.testing.assert_allclose(np.asarray(p), np.asarray(o),
                                       rtol=0, atol=2e-3)

    def test_packed_edge_offsets_zero_pad(self):
        """x-offsets that push past the image edge must NOT read the
        neighboring packed row's lanes (the `same` mask)."""
        x, off, mask, wt, bias = _inputs(b=1, h=4, w=8, scale=0.0)
        # +/- just past each edge: x0+1 lands in the next half for the
        # rightmost pixel, x0 in the previous half for the leftmost
        off = off.at[..., 1::2].set(7.6)   # right overrun
        out = deform_conv2d_rowband(x, off, mask, wt, bias, 2, True)
        ref = deform_conv2d_rowband_ref(x, off, mask, wt, bias, 2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)
        off = off.at[..., 1::2].set(-7.6)  # left overrun
        out = deform_conv2d_rowband(x, off, mask, wt, bias, 2, True)
        ref = deform_conv2d_rowband_ref(x, off, mask, wt, bias, 2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)
