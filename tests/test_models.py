import numpy as np
import jax
import jax.numpy as jnp
import pytest

from centerpoly_tpu.models import create_model
from centerpoly_tpu.models.heads import polydet_heads
from centerpoly_tpu.models.deform_conv import deform_conv2d, DCNv2

HEADS = polydet_heads(num_classes=8, nbr_points=16)


def init_and_run(model, x):
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model.apply(variables, x, train=False), variables


class TestDeformConv:
    def test_zero_offsets_match_plain_conv(self):
        """With zero offsets and unit masks, DCN == plain 3x3 conv."""
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32))
        offsets = jnp.zeros((1, 8, 8, 18))
        masks = jnp.ones((1, 8, 8, 9))
        out = deform_conv2d(x, offsets, masks, w)
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_integer_offset_shifts_sampling(self):
        """Offset (0, +1) on every tap == conv over x shifted left by 1."""
        rng = np.random.RandomState(1)
        x = np.zeros((1, 6, 8, 2), np.float32)
        x[0, :, :6] = rng.randn(6, 6, 2)
        w = jnp.asarray(rng.randn(3, 3, 2, 3).astype(np.float32))
        offsets = np.zeros((1, 6, 8, 18), np.float32)
        offsets[..., 1::2] = 1.0  # dx = +1 for all taps
        out = deform_conv2d(jnp.asarray(x), jnp.asarray(offsets),
                            jnp.ones((1, 6, 8, 9)), w)
        shifted = np.zeros_like(x)
        shifted[:, :, :-1] = x[:, :, 1:]
        ref = jax.lax.conv_general_dilated(
            jnp.asarray(shifted), w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # interior only (border rows see zero-pad differences)
        np.testing.assert_allclose(np.asarray(out)[:, 1:-1, 1:-2],
                                   np.asarray(ref)[:, 1:-1, 1:-2],
                                   rtol=1e-4, atol=1e-4)

    def test_mask_scales_output(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(1, 6, 6, 2).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 2, 2).astype(np.float32))
        z = jnp.zeros((1, 6, 6, 18))
        half = deform_conv2d(x, z, jnp.full((1, 6, 6, 9), 0.5), w)
        full = deform_conv2d(x, z, jnp.ones((1, 6, 6, 9)), w)
        np.testing.assert_allclose(np.asarray(half), np.asarray(full) * 0.5,
                                   rtol=1e-4, atol=1e-5)

    def test_dcnv2_module_init_is_plain_conv(self):
        """Zero-init offset conv => module starts as plain conv + bias."""
        x = jnp.asarray(np.random.RandomState(3).randn(1, 8, 8, 4)
                        .astype(np.float32))
        mod = DCNv2(6)
        variables = mod.init(jax.random.PRNGKey(0), x)
        out = mod.apply(variables, x)
        w = variables["params"]["kernel"]
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # masks start at sigmoid(0) = 0.5
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref) * 0.5,
                                   rtol=1e-4, atol=1e-4)

    def test_differentiable_wrt_offsets(self):
        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.randn(1, 6, 6, 2).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 2, 2).astype(np.float32))
        off = jnp.full((1, 6, 6, 18), 0.3)

        def f(o):
            return jnp.sum(deform_conv2d(x, o, jnp.ones((1, 6, 6, 9)), w))

        g = jax.grad(f)(off)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).sum()) > 0


@pytest.mark.parametrize("arch,stacks,hw", [
    # hourglass needs input divisible by 128 (5 downsamples after /4 stem),
    # matching the reference's pad=127 rule (opts.py:291)
    ("smallhourglass", 1, (128, 128)),
    ("dla_34", 1, (64, 128)),
    ("dlav0_34", 1, (64, 128)),
    ("res_18", 1, (64, 128)),
    ("resdcn_18", 1, (64, 128)),
])
@pytest.mark.slow
def test_model_forward_shapes(arch, stacks, hw):
    model = create_model(arch, HEADS, head_conv=256 if "dla" in arch else 64)
    h, w = hw
    x = jnp.zeros((1, h, w, 3))
    outs, variables = init_and_run(model, x)
    assert len(outs) == stacks
    out = outs[-1]
    assert out["hm"].shape == (1, h // 4, w // 4, 8)
    assert out["poly"].shape == (1, h // 4, w // 4, 32)
    assert out["pseudo_depth"].shape == (1, h // 4, w // 4, 1)
    assert out["reg"].shape == (1, h // 4, w // 4, 2)


@pytest.mark.slow
def test_hourglass_two_stacks():
    model = create_model("hourglass", HEADS, head_conv=256)
    x = jnp.zeros((1, 128, 128, 3))
    outs, _ = init_and_run(model, x)
    assert len(outs) == 2


def test_hm_bias_init():
    model = create_model("smallhourglass", HEADS, head_conv=256)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)),
                           train=False)
    bias = variables["params"]["heads_0"]["hm_out"]["bias"]
    np.testing.assert_allclose(np.asarray(bias), -2.19, rtol=1e-6)


@pytest.mark.slow
def test_train_mode_updates_batch_stats():
    model = create_model("res_18", HEADS, head_conv=64)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3)
                    .astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    outs, mutated = model.apply(variables, x, train=True,
                                mutable=["batch_stats"])
    assert "batch_stats" in mutated


class TestStemLayout:
    """CENTERPOLY_STEM_LAYOUT: alternate low-channel conv layouts must
    be mathematically identical AND leave the parameter tree unchanged
    (checkpoints/torch-import are layout-oblivious)."""

    def _convbn(self, layout, monkeypatch, **kw):
        from centerpoly_tpu.models.layers import ConvBN
        if layout is None:
            monkeypatch.delenv("CENTERPOLY_STEM_LAYOUT", raising=False)
        else:
            monkeypatch.setenv("CENTERPOLY_STEM_LAYOUT", layout)
        m = ConvBN(**kw)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 24, 3),
                        jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        return v, m.apply(v, x)

    @pytest.mark.parametrize("layout", ["nchw", "im2col"])
    def test_layouts_match_nhwc(self, layout, monkeypatch):
        v0, o0 = self._convbn(None, monkeypatch, features=16, kernel=7,
                              stride=2)
        v1, o1 = self._convbn(layout, monkeypatch, features=16, kernel=7,
                              stride=2)
        assert (jax.tree_util.tree_structure(v0)
                == jax.tree_util.tree_structure(v1))
        for a, b in zip(jax.tree_util.tree_leaves(v0),
                        jax.tree_util.tree_leaves(v1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                                   atol=2e-5)

    def test_dilated_biased(self, monkeypatch):
        v0, o0 = self._convbn(None, monkeypatch, features=8, kernel=3,
                              dilation=2, use_bn=False)
        _, o1 = self._convbn("im2col", monkeypatch, features=8, kernel=3,
                             dilation=2, use_bn=False)
        np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                                   atol=2e-5)

    def test_threshold_gates_wide_convs(self, monkeypatch):
        # features=64 > max_c=16 -> plain nn.Conv either way
        v0, o0 = self._convbn(None, monkeypatch, features=64)
        v1, o1 = self._convbn("nchw:16", monkeypatch, features=64)
        np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                                   atol=2e-5)

    def test_full_dla_stem_equivalence(self, monkeypatch):
        """Whole dlav0 forward is identical under the layout override."""
        x = jnp.asarray(np.random.RandomState(1).randn(1, 64, 128, 3),
                        jnp.float32)
        monkeypatch.delenv("CENTERPOLY_STEM_LAYOUT", raising=False)
        model = create_model("dlav0_34", polydet_heads(8, 16), 64)
        v = model.init(jax.random.PRNGKey(0), x)
        outs0 = model.apply(v, x, train=False)
        monkeypatch.setenv("CENTERPOLY_STEM_LAYOUT", "im2col")
        outs1 = model.apply(v, x, train=False)
        for kk in outs0[-1]:
            np.testing.assert_allclose(np.asarray(outs0[-1][kk]),
                                       np.asarray(outs1[-1][kk]),
                                       atol=5e-4)
