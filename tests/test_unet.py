"""Flax U-Net: parameter parity, shapes, activations, dropout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physics_informed_image_segmentation_tpu.models import UNet, count_parameters

REFERENCE_PARAM_COUNT = 20_543_809  # /root/reference/src/unet.py:220-230 measured


def _init(model, shape=(1, 32, 32, 1)):
    return model.init(jax.random.key(0), jnp.zeros(shape))


def test_param_count_matches_reference():
    model = UNet(in_channels=1, out_channels=1, base_channels=64)
    params = _init(model)
    assert count_parameters(params) == REFERENCE_PARAM_COUNT


def test_forward_shape_and_range():
    model = UNet(base_channels=8)
    params = _init(model, (2, 64, 64, 1))
    out = model.apply(params, jnp.ones((2, 64, 64, 1)))
    assert out.shape == (2, 64, 64, 1)
    assert out.dtype == jnp.float32
    o = np.asarray(out)
    assert (o > 0).all() and (o < 1).all()


def test_tanh_output_rescaled_to_unit_interval():
    model = UNet(base_channels=8, output_activation="tanh")
    params = _init(model)
    out = np.asarray(model.apply(params, jnp.ones((1, 32, 32, 1))))
    assert (out > 0).all() and (out < 1).all()


@pytest.mark.parametrize(
    "act", ["relu", "leaky_relu", "elu", "gelu", "swish", "mish", "prelu"]
)
def test_all_activations_run(act):
    model = UNet(base_channels=4, intermediate_activation=act)
    params = _init(model)
    out = model.apply(params, jnp.ones((1, 16, 16, 1)))
    assert np.isfinite(np.asarray(out)).all()


def test_prelu_one_shared_weight_per_block():
    model = UNet(base_channels=4, intermediate_activation="prelu")
    params = _init(model)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    prelu_leaves = [p for p, v in flat if "prelu" in str(p)]
    # 9 DoubleConv blocks, one scalar weight each (reference quirk:
    # a single nn.PReLU instance shared by both convs of a block).
    assert len(prelu_leaves) == 9


def test_invalid_activation_raises():
    with pytest.raises(ValueError):
        _init(UNet(base_channels=4, intermediate_activation="nope"))
    with pytest.raises(ValueError):
        _init(UNet(base_channels=4, output_activation="softmax"))


def test_invalid_upsample_variant_raises():
    # a typo'd variant must fail loudly, not silently benchmark einsum6
    with pytest.raises(ValueError, match="FastUpsample variant"):
        _init(UNet(base_channels=4, upsample_variant="tap"))


class TestSplitDecoder:
    """decoder='split' (concat-free skip fusion): identical param tree,
    numerically equivalent outputs/grads (two-partial-sum accumulation
    rounds differently at ULP level — tolerance, not bit-equality)."""

    def test_param_tree_identical_and_outputs_match(self):
        x = jnp.asarray(
            np.random.default_rng(0).uniform(size=(2, 64, 64, 1)).astype(np.float32)
        )
        m1 = UNet(base_channels=8)
        m2 = UNet(base_channels=8, decoder="split")
        p = m1.init(jax.random.key(0), x)
        p2 = m2.init(jax.random.key(0), x)
        assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(p2)
        for a, b in zip(
            jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(p2)
        ):
            assert a.shape == b.shape
        y1, y2 = m1.apply(p, x), m2.apply(p, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-6)

    def test_grads_equivalent(self):
        x = jnp.asarray(
            np.random.default_rng(1).uniform(size=(2, 64, 64, 1)).astype(np.float32)
        )
        m1 = UNet(base_channels=8)
        m2 = UNet(base_channels=8, decoder="split")
        p = m1.init(jax.random.key(0), x)

        def grads(m):
            return jax.grad(lambda pp: jnp.sum(m.apply(pp, x) ** 2))(p)

        for a, b in zip(
            jax.tree_util.tree_leaves(grads(m1)),
            jax.tree_util.tree_leaves(grads(m2)),
        ):
            scale = float(jnp.abs(a).max()) + 1e-12
            assert float(jnp.abs(a - b).max()) / scale < 1e-5

    def test_remat_and_checkpoint_interchange(self):
        x = jnp.asarray(
            np.random.default_rng(2).uniform(size=(1, 32, 32, 1)).astype(np.float32)
        )
        m1 = UNet(base_channels=4)
        m3 = UNet(base_channels=4, decoder="split", remat=True)
        p = m1.init(jax.random.key(0), x)
        # params trained/saved under concat load straight into split+remat
        np.testing.assert_allclose(
            np.asarray(m1.apply(p, x)), np.asarray(m3.apply(p, x)), atol=2e-6
        )

    def test_invalid_decoder_raises(self):
        with pytest.raises(ValueError, match="decoder mode"):
            _init(UNet(base_channels=4, decoder="fused"))


def test_dropout_train_vs_eval():
    model = UNet(base_channels=8, dropout=0.5)
    params = _init(model)
    x = jnp.ones((1, 32, 32, 1))
    eval1 = model.apply(params, x, deterministic=True)
    eval2 = model.apply(params, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(eval1), np.asarray(eval2))
    train1 = model.apply(
        params, x, deterministic=False, rngs={"dropout": jax.random.key(1)}
    )
    train2 = model.apply(
        params, x, deterministic=False, rngs={"dropout": jax.random.key(2)}
    )
    assert not np.allclose(np.asarray(train1), np.asarray(train2))


def test_bfloat16_compute_dtype():
    model = UNet(base_channels=8, dtype=jnp.bfloat16)
    params = _init(model)
    # params stay float32
    assert all(
        p.dtype == jnp.float32 for p in jax.tree_util.tree_leaves(params)
    )
    out = model.apply(params, jnp.ones((1, 32, 32, 1)))
    assert out.dtype == jnp.float32  # cast back for loss accumulation


def test_jit_forward():
    model = UNet(base_channels=8)
    params = _init(model)
    f = jax.jit(lambda p, x: model.apply(p, x))
    out = f(params, jnp.ones((1, 32, 32, 1)))
    assert out.shape == (1, 32, 32, 1)


def test_fast_upsample_identical_to_conv_transpose():
    """FastUpsample == ConvTranspose(k=2,s=2) with the SAME params."""
    m_fast = UNet(base_channels=8, dropout=0.0, fast_upsample=True)
    m_ct = UNet(base_channels=8, dropout=0.0, fast_upsample=False)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 32, 32, 1)).astype(np.float32)
    )
    params = m_ct.init(jax.random.key(0), x)
    out_ct = np.asarray(m_ct.apply(params, x))
    out_fast = np.asarray(m_fast.apply(params, x))  # same param tree
    np.testing.assert_allclose(out_fast, out_ct, atol=1e-6)
    # param count unchanged
    assert count_parameters(m_fast.init(jax.random.key(1), x)) == count_parameters(
        params
    )


def test_remat_identical_outputs_and_grads():
    m0 = UNet(base_channels=4, dropout=0.0)
    m1 = UNet(base_channels=4, dropout=0.0, remat=True)
    x = jnp.ones((1, 32, 32, 1))
    p = m0.init(jax.random.key(0), x)
    np.testing.assert_allclose(
        np.asarray(m0.apply(p, x)), np.asarray(m1.apply(p, x)), atol=1e-6
    )
    g0 = jax.grad(lambda pp: float(0) + jnp.sum(m0.apply(pp, x)))(p)
    g1 = jax.grad(lambda pp: float(0) + jnp.sum(m1.apply(pp, x)))(p)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        g0,
        g1,
    )


class TestTorchInitFamily:
    """`param_init="torch"` — torch's reset_parameters distribution family
    (kaiming_uniform(a=sqrt(5)) kernels, uniform ±1/sqrt(fan) biases)."""

    def test_same_param_tree_and_count(self):
        x = jnp.zeros((1, 32, 32, 1))
        pa = UNet(base_channels=8).init(jax.random.key(0), x)
        pb = UNet(base_channels=8, param_init="torch").init(jax.random.key(0), x)
        ka = {str(k): v.shape for k, v in jax.tree_util.tree_leaves_with_path(pa)}
        kb = {str(k): v.shape for k, v in jax.tree_util.tree_leaves_with_path(pb)}
        assert ka == kb
        assert count_parameters(pa) == count_parameters(pb)

    def test_biases_nonzero_and_bounded(self):
        x = jnp.zeros((1, 32, 32, 1))
        p = UNet(base_channels=8, param_init="torch").init(jax.random.key(0), x)
        biases = [
            (str(k), np.asarray(v))
            for k, v in jax.tree_util.tree_leaves_with_path(p)
            if "bias" in str(k)
        ]
        assert biases and any(np.abs(b).max() > 0 for _, b in biases)
        # enc1/conv1: fan = 9 * 1 -> bound 1/3; all draws inside the bound
        first = [b for k, b in biases if "enc1" in k and "conv1" in k][0]
        assert np.abs(first).max() <= 1.0 / 3.0

    def test_kernel_scale_matches_torch_family(self):
        # enc1/conv2 kernel (3,3,8,8): torch bound = 1/sqrt(fan_in=72)
        x = jnp.zeros((1, 32, 32, 1))
        p = UNet(base_channels=8, param_init="torch").init(jax.random.key(0), x)
        k = [
            np.asarray(v)
            for kk, v in jax.tree_util.tree_leaves_with_path(p)
            if "enc1" in str(kk) and "conv2" in str(kk) and "kernel" in str(kk)
        ][0]
        bound = 1.0 / np.sqrt(9 * k.shape[2])
        assert np.abs(k).max() <= bound
        # uniform in ±bound has std bound/sqrt(3); check within 15%
        assert abs(k.std() - bound / np.sqrt(3)) < 0.15 * bound

    def test_initial_prediction_not_degenerate(self):
        # the zero-bias default emits exactly 0.5 everywhere at init (the
        # thresholded prediction is degenerate-empty); the torch family
        # emits sigmoid(b) != 0.5
        x = jnp.zeros((2, 32, 32, 1))
        m = UNet(base_channels=8, param_init="torch")
        out = np.asarray(m.apply(m.init(jax.random.key(3), x), x))
        assert abs(float(out.mean()) - 0.5) > 1e-4

    def test_invalid_value_raises(self):
        x = jnp.zeros((1, 32, 32, 1))
        with pytest.raises(ValueError, match="param_init"):
            UNet(base_channels=8, param_init="xavier").init(jax.random.key(0), x)
