"""conv3x3_same (Pallas) vs lax.conv_general_dilated, fwd + VJP.

CPU runs through the Pallas interpreter (conftest forces the cpu
backend); on TPU the same tests exercise the real Mosaic lowering.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physics_informed_image_segmentation_tpu.ops.pallas_conv import conv3x3_same


def _xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _data(b=2, h=16, w=16, cin=8, cout=8, dtype=jnp.float32, seed=0):
    k1, k2 = jax.random.split(jax.random.key(seed))
    x = jax.random.normal(k1, (b, h, w, cin), dtype)
    wt = (jax.random.normal(k2, (3, 3, cin, cout), jnp.float32) * 0.1).astype(dtype)
    return x, wt


@pytest.mark.parametrize("paired", [False, True])
@pytest.mark.parametrize("shape", [(2, 16, 16, 8, 8), (1, 8, 32, 4, 12)])
def test_forward_matches_xla(paired, shape):
    b, h, w, cin, cout = shape
    x, wt = _data(b, h, w, cin, cout)
    ours = conv3x3_same(x, wt, paired)
    ref = _xla_conv(x, wt)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("paired", [False, True])
def test_vjp_matches_xla(paired):
    x, wt = _data()

    def f_ours(x, w):
        return jnp.sum(conv3x3_same(x, w, paired) ** 2)

    def f_ref(x, w):
        return jnp.sum(_xla_conv(x, w) ** 2)

    (lo, (dxo, dwo)) = jax.value_and_grad(f_ours, argnums=(0, 1))(x, wt)
    (lr, (dxr, dwr)) = jax.value_and_grad(f_ref, argnums=(0, 1))(x, wt)
    np.testing.assert_allclose(float(lo), float(lr), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dxo), np.asarray(dxr),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dwo), np.asarray(dwr),
                               rtol=1e-4, atol=1e-4)


def test_bf16_storage_f32_accum():
    x, wt = _data(dtype=jnp.bfloat16)
    ours = conv3x3_same(x, wt, False)
    ref = _xla_conv(x, wt)
    assert ours.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(ours, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2)


def test_border_zero_padding():
    """An all-ones input: border sums must reflect zero padding exactly."""
    x = jnp.ones((1, 8, 16, 4))
    wt = jnp.ones((3, 3, 4, 4))
    out = np.asarray(conv3x3_same(x, wt, False))
    assert np.allclose(out[0, 4, 8], 9 * 4)     # interior: all 9 taps
    assert np.allclose(out[0, 0, 8], 6 * 4)     # top edge: 6 taps
    assert np.allclose(out[0, 0, 0], 4 * 4)     # corner: 4 taps


@pytest.mark.parametrize("paired", [False, True])
def test_multiblock_tiling_matches_xla(paired, monkeypatch):
    """Force the row-block grid (nb>1): roll wraps at block boundaries
    must land only on masked border columns, fwd and VJP."""
    import physics_informed_image_segmentation_tpu.ops.pallas_conv as pc

    monkeypatch.setattr(pc, "_BLOCK_PIXELS", 64)  # w=16 -> 4-row blocks
    x, wt = _data(b=2, h=16, w=16, cin=8, cout=8, seed=3)
    assert pc._block_rows(16, 16) == 4

    np.testing.assert_allclose(
        np.asarray(pc.conv3x3_same(x, wt, paired)),
        np.asarray(_xla_conv(x, wt)), rtol=1e-5, atol=1e-5)

    def f_ours(x, w):
        return jnp.sum(pc.conv3x3_same(x, w, paired) ** 2)

    def f_ref(x, w):
        return jnp.sum(_xla_conv(x, w) ** 2)

    (_, (dxo, dwo)) = jax.value_and_grad(f_ours, argnums=(0, 1))(x, wt)
    (_, (dxr, dwr)) = jax.value_and_grad(f_ref, argnums=(0, 1))(x, wt)
    np.testing.assert_allclose(np.asarray(dxo), np.asarray(dxr),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dwo), np.asarray(dwr),
                               rtol=1e-4, atol=1e-4)
