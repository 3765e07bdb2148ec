"""DCN offset observability (tools/analyze_dcn_offsets.py).

DCNv2 sows its offsets into the `intermediates` collection; the
analyzer reports per-node |offset| percentiles and R-clamp saturation
— the evidence basis for choosing the bounded-offset kernels' R.
"""
import numpy as np

import jax

from centerpoly_tpu.configs import Config
from centerpoly_tpu.tools.analyze_dcn_offsets import collect, offset_stats


def test_collect_reports_every_dcn_node():
    cfg = Config(task="polydet", dataset="cityscapes", arch="dla_34",
                 input_h=64, input_w=128)
    inter = collect(cfg)
    rows = offset_stats(inter, 4.0)
    # DLA-34 at inference: 16 DCNv2 nodes (DLAUp + IDAUp)
    assert len(rows) == 16, [r["node"] for r in rows]
    # fresh init: zero-initialized offset conv -> all-zero offsets
    for r in rows:
        assert r["y_max"] == 0.0 and r["xy_frac_clamped_at_r"] == 0.0


def test_saturation_fractions():
    """Stats math: known offsets -> known clamp fractions."""
    off = np.zeros((1, 2, 2, 18), np.float32)
    off[..., 0] = 5.0   # one y channel far out
    off[..., 1] = 1.0   # its x partner small
    inter = {"node": {"dcn_offsets": (off,)}}
    rows = offset_stats(inter, 4.0)
    assert len(rows) == 1
    r = rows[0]
    assert r["y_max"] == 5.0
    # y channels: 9 per pixel, one of them 5.0 -> 1/9 clamped
    np.testing.assert_allclose(r["y_frac_clamped_at_r"], 1 / 9, atol=1e-6)
    # all 18 channels: 1/18 over R
    np.testing.assert_allclose(r["xy_frac_clamped_at_r"], 1 / 18,
                               atol=1e-6)


def test_sow_is_inert_without_mutable():
    """Plain apply must not change outputs or leak collections."""
    from centerpoly_tpu.models.deform_conv import DCNv2
    import jax.numpy as jnp
    m = DCNv2(8)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 8),
                    jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 8, 8, 8)
    out2, inter = m.apply(v, x, mutable=["intermediates"])
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    assert "dcn_offsets" in str(jax.tree_util.tree_structure(inter))
