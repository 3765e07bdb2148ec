"""Bounded-offset halo DCNv2 kernel (kernels/dcn_halo.py).

Interpret-mode numerics run on CPU every time (small shapes, R=2):
forward vs the clamped-offset XLA oracle, and the Pallas BACKWARD kernel
vs XLA autodiff of the oracle — grads for x, offsets, masks, weights,
bias (VERDICT round-2 items 2 and 9).  Gating tests cover the env
switch; the real-chip compile probe is exercised by
experiments/bench_dcn_kernel.py on TPU.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from centerpoly_tpu.kernels.dcn_halo import (
    DEFAULT_MAX_OFFSET, deform_conv2d_halo, deform_conv2d_halo_ref,
    halo_supported)


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
        assert halo_supported(16, 16, 8, 8) is False

    def test_mode_parsing(self, monkeypatch):
        from centerpoly_tpu.models.deform_conv import halo_dcn_mode
        monkeypatch.setenv("CENTERPOLY_PALLAS_DCN", "auto")
        assert halo_dcn_mode(8, 8, 8, 8) == (False, None)
        monkeypatch.setenv("CENTERPOLY_PALLAS_DCN", "halo")
        use, r = halo_dcn_mode(8, 8, 8, 8)
        assert r == DEFAULT_MAX_OFFSET and use is False  # cpu backend
        monkeypatch.setenv("CENTERPOLY_PALLAS_DCN", "halo:3")
        assert halo_dcn_mode(8, 8, 8, 8)[1] == 3

    def test_module_halo_fallback_clamps(self, monkeypatch):
        """In halo mode on CPU the module must run the XLA path WITH the
        clamp — same math the kernel would compute."""
        from centerpoly_tpu.models.deform_conv import DCNv2
        m = DCNv2(8)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 16, 8),
                        jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        monkeypatch.setenv("CENTERPOLY_PALLAS_DCN", "halo:2")
        out = m.apply(v, x)
        assert out.shape == (1, 8, 16, 8)
        # zero-init offset conv -> offsets are 0, clamp is a no-op ->
        # must equal the plain path exactly
        monkeypatch.setenv("CENTERPOLY_PALLAS_DCN", "0")
        ref = m.apply(v, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)


class TestInterpretNumerics:
    R = 2

    def test_forward_matches_clamped_oracle(self):
        x, off, mask, wt, bias = _inputs()
        out = deform_conv2d_halo(x, off, mask, wt, bias, self.R, True)
        ref = deform_conv2d_halo_ref(x, off, mask, wt, bias, self.R)
        assert float(jnp.max(jnp.abs(out - ref))) < 1e-5

    def test_offset_grads_at_integer_offsets(self):
        """Zero / interior-integer offsets must match the oracle: the
        hat derivative uses the one-sided floor/frac convention, not
        -sign (which is 0 at integer displacements — every pixel at
        offset init).  Exact-bound offsets (|off| == R) deliberately
        deviate (zeroed; see _halo_bwd_rule) and are not tested here."""
        x, off, mask, wt, bias = _inputs()
        r = self.R

        def gk(o):
            return jax.grad(lambda oo: jnp.sum(
                deform_conv2d_halo(x, oo, mask, wt, bias, r, True) ** 2))(o)

        def gr(o):
            return jax.grad(lambda oo: jnp.sum(
                deform_conv2d_halo_ref(x, oo, mask, wt, bias, r) ** 2))(o)

        zero = jnp.zeros_like(off)
        ints = jnp.asarray(
            np.random.RandomState(3).randint(-(r - 1), r, off.shape),
            jnp.float32)
        for o in (zero, ints):
            a, b = gk(o), gr(o)
            assert float(jnp.max(jnp.abs(b))) > 0.1
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-4)

    @pytest.mark.slow
    def test_backward_kernel_matches_xla_autodiff(self):
        x, off, mask, wt, bias = _inputs()
        r = self.R

        def loss_pallas(*a):
            return jnp.sum(deform_conv2d_halo(*a, r, True) ** 2)

        def loss_ref(*a):
            return jnp.sum(deform_conv2d_halo_ref(*a, r) ** 2)

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(
            x, off, mask, wt, bias)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
            x, off, mask, wt, bias)
        for name, a, b in zip(("dx", "doff", "dmask", "dw", "db"), gp, gr):
            err = float(jnp.max(jnp.abs(a - b)))
            denom = float(jnp.max(jnp.abs(b))) + 1e-8
            assert err / denom < 1e-5, f"{name}: rel err {err / denom}"
