"""Numerical-equivalence tests for the round-2 performance paths.

1. ``ops.pool.max_pool_2x2``: forward == flax ``nn.max_pool`` exactly;
   backward == torch ``MaxPool2d`` exactly INCLUDING ties (first-match
   routing in row-major window order), where ``jnp.max``'s own VJP
   would split gradient among ties.
2. ``create_train_state(flat=True)``: flat single-vector parameter
   storage trains bit-identically to tree storage (same grads, same
   AdamW trajectory).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from flax import linen as nn

from physics_informed_image_segmentation_tpu.data import DeviceDataset, make_blobs
from physics_informed_image_segmentation_tpu.models import UNet
from physics_informed_image_segmentation_tpu.ops.pool import max_pool_2x2
from physics_informed_image_segmentation_tpu.train import (
    LossConfig,
    create_train_state,
    make_train_epoch_fn,
    tree_params,
)
from physics_informed_image_segmentation_tpu.data import epoch_batch_indices


class TestFusedMaxPool:
    def test_forward_matches_nn_max_pool(self, rng):
        x = jnp.asarray(rng.normal(size=(3, 16, 20, 7)).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(max_pool_2x2(x)),
            np.asarray(nn.max_pool(x, (2, 2), strides=(2, 2))),
        )

    def test_backward_matches_torch_random(self, rng):
        x_np = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
        g_np = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)

        _, vjp = jax.vjp(max_pool_2x2, jnp.asarray(x_np))
        (dx,) = vjp(jnp.asarray(g_np))

        xt = torch.tensor(x_np.transpose(0, 3, 1, 2), requires_grad=True)
        out = torch.nn.functional.max_pool2d(xt, 2)
        out.backward(torch.tensor(g_np.transpose(0, 3, 1, 2)))
        np.testing.assert_array_equal(
            np.asarray(dx), xt.grad.numpy().transpose(0, 2, 3, 1)
        )

    def test_backward_matches_torch_with_ties(self):
        # constant windows (all four elements tie), plus blocks with
        # duplicated maxima in different positions
        x_np = np.zeros((1, 4, 4, 1), np.float32)
        x_np[0, :, :, 0] = [
            [1, 1, 2, 5],
            [1, 1, 5, 2],
            [3, 0, 7, 7],
            [3, 0, 7, 7],
        ]
        g_np = np.arange(1, 5, dtype=np.float32).reshape(1, 2, 2, 1)

        _, vjp = jax.vjp(max_pool_2x2, jnp.asarray(x_np))
        (dx,) = vjp(jnp.asarray(g_np))

        xt = torch.tensor(x_np.transpose(0, 3, 1, 2), requires_grad=True)
        out = torch.nn.functional.max_pool2d(xt, 2)
        out.backward(torch.tensor(g_np.transpose(0, 3, 1, 2)))
        torch_dx = xt.grad.numpy().transpose(0, 2, 3, 1)

        np.testing.assert_array_equal(np.asarray(dx), torch_dx)
        # ... and prove the tie actually matters: plain jnp.max VJP
        # splits gradient among the four tied elements.
        def plain(x):
            b, h, w, c = x.shape
            return x.reshape(b, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))

        _, vjp2 = jax.vjp(plain, jnp.asarray(x_np))
        (dx_plain,) = vjp2(jnp.asarray(g_np))
        assert not np.array_equal(np.asarray(dx_plain), torch_dx)

    def test_unet_pool_modes_forward_identical(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32))
        m1 = UNet(base_channels=4, dropout=0.0, pool="fused")
        m2 = UNet(base_channels=4, dropout=0.0, pool="xla")
        params = m1.init(jax.random.key(0), x)
        np.testing.assert_array_equal(
            np.asarray(m1.apply(params, x)), np.asarray(m2.apply(params, x))
        )

    def test_unet_pool_modes_gradient_identical(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 1)).astype(np.float32))
        y = jnp.asarray((rng.uniform(size=(2, 16, 16, 1)) > 0.5).astype(np.float32))
        m1 = UNet(base_channels=4, dropout=0.0, pool="fused")
        m2 = UNet(base_channels=4, dropout=0.0, pool="xla")
        params = m1.init(jax.random.key(0), x)

        def loss(m):
            def f(p):
                pred = m.apply(p, x)
                return jnp.mean((pred - y) ** 2)

            return f

        g1 = jax.grad(loss(m1))(params)
        g2 = jax.grad(loss(m2))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestFlatTrainState:
    @pytest.mark.parametrize("dropout", [0.0, 0.2])
    def test_flat_trains_identically_to_tree(self, dropout):
        tr = DeviceDataset.from_numpy(*make_blobs(8, 32, 32, seed=0))
        model = UNet(base_channels=4, dropout=dropout)
        cfg = LossConfig(pde_weight=1e-4, phase_field_weight=1e-4)
        epoch_fn = make_train_epoch_fn(model, cfg, compute_metrics=True)
        idx, valid = epoch_batch_indices(tr.n, 4, shuffle=False)

        results = {}
        for flat in (False, True):
            state = create_train_state(
                model, jax.random.key(3), 1e-3, input_shape=(1, 32, 32, 1), flat=flat
            )
            for _ in range(3):
                state, r = epoch_fn(state, tr.images, tr.masks, idx, valid)
            results[flat] = (tree_params(state), r)

        p_tree, r_tree = results[False]
        p_flat, r_flat = results[True]
        for k in r_tree:
            np.testing.assert_allclose(
                float(r_tree[k]), float(r_flat[k]), rtol=1e-6, err_msg=k
            )
        for a, b in zip(
            jax.tree_util.tree_leaves(p_tree), jax.tree_util.tree_leaves(p_flat)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=1e-7
            )

    def test_tree_params_roundtrip(self):
        model = UNet(base_channels=4)
        state = create_train_state(
            model, jax.random.key(0), 1e-4, input_shape=(1, 32, 32, 1), flat=True
        )
        assert state.params.ndim == 1
        tree = tree_params(state)
        ref = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))
        # same structure as a fresh init (values differ only by rng use)
        assert jax.tree_util.tree_structure(tree) == jax.tree_util.tree_structure(ref)


class TestFlatAdamW:
    """flat_adamw must be BIT-identical to optax.adamw (same elementwise
    math, flat m/v storage)."""

    def test_bit_identical_trajectory(self):
        import optax

        from physics_informed_image_segmentation_tpu.train.optim import flat_adamw

        tr = DeviceDataset.from_numpy(*make_blobs(8, 32, 32, seed=0))
        model = UNet(base_channels=4, dropout=0.2)
        cfg = LossConfig(pde_weight=1e-4, phase_field_weight=1e-4)
        epoch_fn = make_train_epoch_fn(model, cfg, compute_metrics=False)
        idx, valid = epoch_batch_indices(tr.n, 4, shuffle=False)

        final = {}
        for name in ("adamw", "flat_adamw"):
            state = create_train_state(
                model, jax.random.key(7), 1e-3, input_shape=(1, 32, 32, 1),
                optimizer=name,
            )
            for _ in range(3):
                state, r = epoch_fn(state, tr.images, tr.masks, idx, valid)
            final[name] = (state.params, float(r["loss"]))

        assert final["adamw"][1] == final["flat_adamw"][1]
        for a, b in zip(
            jax.tree_util.tree_leaves(final["adamw"][0]),
            jax.tree_util.tree_leaves(final["flat_adamw"][0]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_matches_optax_single_step_random_tree(self, rng):
        import optax

        from physics_informed_image_segmentation_tpu.train.optim import flat_adamw

        params = {
            "a": jnp.asarray(rng.normal(size=(3, 3, 8, 16)).astype(np.float32)),
            "b": {"w": jnp.asarray(rng.normal(size=(5,)).astype(np.float32))},
        }
        grads = jax.tree_util.tree_map(
            lambda p: jnp.asarray(rng.normal(size=p.shape).astype(np.float32)), params
        )
        tx1 = optax.adamw(3e-4, weight_decay=1e-5)
        tx2 = flat_adamw(3e-4, weight_decay=1e-5)
        s1, s2 = tx1.init(params), tx2.init(params)
        p1, p2 = params, params
        for _ in range(5):
            u1, s1 = tx1.update(grads, s1, p1)
            p1 = optax.apply_updates(p1, u1)
            u2, s2 = tx2.update(grads, s2, p2)
            p2 = optax.apply_updates(p2, u2)
        for a, b in zip(
            jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestLowPrecisionAdamW:
    """low_precision_adamw: f32 storage must be bit-identical to
    optax.adamw; bf16 moment storage must track it closely (documented
    NON-parity approximation) with the promised storage dtypes."""

    def _tree(self, rng):
        params = {
            "a": jnp.asarray(rng.normal(size=(3, 3, 8, 16)).astype(np.float32)),
            "b": {"w": jnp.asarray(rng.normal(size=(5,)).astype(np.float32))},
        }
        grads = jax.tree_util.tree_map(
            lambda p: jnp.asarray(
                0.1 * rng.normal(size=p.shape).astype(np.float32)
            ),
            params,
        )
        return params, grads

    def _run(self, tx, params, grads, steps=10):
        import optax

        s = tx.init(params)
        p = params
        for _ in range(steps):
            u, s = tx.update(grads, s, p)
            p = optax.apply_updates(p, u)
        return p, s

    def test_f32_storage_bit_identical_to_optax(self, rng):
        import optax

        from physics_informed_image_segmentation_tpu.train.optim import (
            low_precision_adamw,
        )

        params, grads = self._tree(rng)
        p1, _ = self._run(optax.adamw(3e-4, weight_decay=1e-5), params, grads)
        p2, _ = self._run(
            low_precision_adamw(
                3e-4, weight_decay=1e-5, m_dtype=jnp.float32, v_dtype=jnp.float32
            ),
            params,
            grads,
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_bf16_m_tracks_optax_and_dtypes(self, rng):
        import optax

        from physics_informed_image_segmentation_tpu.train.optim import (
            low_precision_adamw,
        )

        params, grads = self._tree(rng)
        p1, _ = self._run(optax.adamw(3e-4, weight_decay=1e-5), params, grads)
        p2, s2 = self._run(
            low_precision_adamw(3e-4, weight_decay=1e-5), params, grads
        )
        for m_leaf in jax.tree_util.tree_leaves(s2.m):
            assert m_leaf.dtype == jnp.bfloat16
        for v_leaf in jax.tree_util.tree_leaves(s2.v):
            assert v_leaf.dtype == jnp.float32
        # 10 steps of ~lr-sized updates: bf16 m quantisation (~0.4%)
        # perturbs each step's update by <<1% of its magnitude
        for a, b in zip(
            jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=5e-5
            )

    def test_train_state_variants_train_without_nan(self):
        tr = DeviceDataset.from_numpy(*make_blobs(8, 32, 32, seed=0))
        model = UNet(base_channels=4, dropout=0.2)
        cfg = LossConfig(pde_weight=1e-4, phase_field_weight=1e-4)
        epoch_fn = make_train_epoch_fn(model, cfg, compute_metrics=False)
        idx, valid = epoch_batch_indices(tr.n, 4, shuffle=False)

        ref_loss = None
        for name in ("adamw", "bf16m_adamw", "bf16mv_adamw"):
            state = create_train_state(
                model, jax.random.key(7), 1e-3, input_shape=(1, 32, 32, 1),
                optimizer=name,
            )
            for _ in range(3):
                state, r = epoch_fn(state, tr.images, tr.masks, idx, valid)
            loss = float(r["loss"])
            assert np.isfinite(loss)
            if ref_loss is None:
                ref_loss = loss
            else:
                # approximations must land within 2% of the exact loss
                assert abs(loss - ref_loss) / abs(ref_loss) < 0.02


class TestGroupedAdamW:
    """grouped_adamw (small leaves flattened into ONE fused update, big
    leaves native) must be bit-identical to optax.adamw.  (On TPU it
    measured SLOWER — the small-leaf ravel/unravel relayout copies cost
    more than the pathological per-leaf fusions they remove — a kept,
    documented negative; see docs/DESIGN.md §7.)"""

    def test_trains_bit_identically(self):
        tr = DeviceDataset.from_numpy(*make_blobs(8, 32, 32, seed=0))
        model = UNet(base_channels=4, dropout=0.2)
        cfg = LossConfig(pde_weight=1e-4, phase_field_weight=1e-4)
        epoch_fn = make_train_epoch_fn(model, cfg, compute_metrics=False)
        idx, valid = epoch_batch_indices(tr.n, 4, shuffle=False)

        final = {}
        for name in ("adamw", "grouped_adamw"):
            state = create_train_state(
                model, jax.random.key(7), 1e-3, input_shape=(1, 32, 32, 1),
                optimizer=name,
            )
            for _ in range(3):
                state, r = epoch_fn(state, tr.images, tr.masks, idx, valid)
            final[name] = (state.params, float(r["loss"]))

        assert final["adamw"][1] == final["grouped_adamw"][1]
        for a, b in zip(
            jax.tree_util.tree_leaves(final["adamw"][0]),
            jax.tree_util.tree_leaves(final["grouped_adamw"][0]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.parametrize("max_group_elems", [0, 60, 10_000_000])
    def test_matches_optax_mixed_groups(self, rng, max_group_elems):
        """Thresholds exercising all-native, mixed, and all-grouped splits."""
        import optax

        from physics_informed_image_segmentation_tpu.train.optim import (
            grouped_adamw,
        )

        params = {
            "a": jnp.asarray(rng.normal(size=(3, 3, 8, 16)).astype(np.float32)),
            "b": {"w": jnp.asarray(rng.normal(size=(5,)).astype(np.float32))},
            "c": jnp.asarray(rng.normal(size=(64,)).astype(np.float32)),
        }
        tx1 = optax.adamw(3e-4, weight_decay=1e-5)
        tx2 = grouped_adamw(3e-4, weight_decay=1e-5, max_group_elems=max_group_elems)
        s1, s2 = tx1.init(params), tx2.init(params)
        p1, p2 = params, params
        for step in range(5):
            grads = jax.tree_util.tree_map(lambda p: jnp.sin(p * (step + 1)), p1)
            u1, s1 = tx1.update(grads, s1, p1)
            p1 = optax.apply_updates(p1, u1)
            grads2 = jax.tree_util.tree_map(lambda p: jnp.sin(p * (step + 1)), p2)
            u2, s2 = tx2.update(grads2, s2, p2)
            p2 = optax.apply_updates(p2, u2)
        for a, b in zip(
            jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestFastUpsampleVariants:
    """The "taps" lowering (one matmul per kernel tap + stack interleave)
    must be numerically equivalent to the default "einsum6" lowering.
    Not bit-identical in general (different dot blocking), so tolerance
    rather than equality — the 0-ULP ConvTranspose-compatibility
    invariant is pinned on the DEFAULT variant in tests/test_unet.py."""

    def test_forward_and_grad_close(self, rng):
        from physics_informed_image_segmentation_tpu.models.unet import FastUpsample

        x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
        m1 = FastUpsample(8, jnp.float32, "einsum6")
        m2 = FastUpsample(8, jnp.float32, "taps")
        p = m1.init(jax.random.key(1), x)
        np.testing.assert_allclose(
            np.asarray(m1.apply(p, x)), np.asarray(m2.apply(p, x)),
            rtol=1e-6, atol=1e-6,
        )
        g1 = jax.grad(lambda q: float_loss(m1, q, x))(p)
        g2 = jax.grad(lambda q: float_loss(m2, q, x))(p)
        for a, b in zip(
            jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
            )

    def test_convtranspose_lowering_matches(self, rng):
        """The native XLA conv_transpose lowering (the A/B control for
        the matmul formulations) computes the same map: for k=s=2 each
        output pixel is a single length-C contraction, so forward and
        gradients agree with "einsum6" to dot-blocking tolerance."""
        from physics_informed_image_segmentation_tpu.models.unet import FastUpsample

        x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
        m1 = FastUpsample(8, jnp.float32, "einsum6")
        m3 = FastUpsample(8, jnp.float32, "convtranspose")
        p = m1.init(jax.random.key(1), x)
        np.testing.assert_allclose(
            np.asarray(m1.apply(p, x)), np.asarray(m3.apply(p, x)),
            rtol=1e-6, atol=1e-6,
        )
        g1 = jax.grad(lambda q: float_loss(m1, q, x))(p)
        g3 = jax.grad(lambda q: float_loss(m3, q, x))(p)
        for a, b in zip(
            jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g3)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
            )


def float_loss(module, params, x):
    return jnp.sum(jnp.sin(module.apply(params, x)))


class TestPallasAdamW:
    """Bucketed multi-ref Pallas AdamW (train/pallas_optim.py): both the
    bucketed-kernel path and the big-leaf XLA path must be bit-identical
    to optax.adamw.  (On TPU it measured SLOWER than optax — a kept,
    documented negative — but it must stay correct.)"""

    def _run(self, opt, bucket_bytes=None):
        from physics_informed_image_segmentation_tpu.train import pallas_optim as po

        old = po._BUCKET_BYTES
        if bucket_bytes is not None:
            po._BUCKET_BYTES = bucket_bytes
        try:
            tr = DeviceDataset.from_numpy(*make_blobs(8, 32, 32, seed=0))
            model = UNet(base_channels=4, dropout=0.2)
            fn = make_train_epoch_fn(model, LossConfig(pde_weight=1e-4))
            idx, valid = epoch_batch_indices(tr.n, 4, shuffle=False)
            st = create_train_state(
                model, jax.random.key(3), 1e-3, input_shape=(1, 32, 32, 1),
                optimizer=opt,
            )
            for _ in range(3):
                st, r = fn(st, tr.images, tr.masks, idx, valid)
            return st.params, float(r["loss"])
        finally:
            po._BUCKET_BYTES = old

    def test_bucketed_path_bit_identical(self):
        p_ref, l_ref = self._run("adamw")
        p_pl, l_pl = self._run("pallas_adamw")  # all leaves bucketed
        assert l_ref == l_pl
        for a, b in zip(
            jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_pl)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_big_leaf_path_bit_identical(self):
        p_ref, l_ref = self._run("adamw")
        # tiny cap forces most leaves onto the big-leaf XLA branch
        p_pl, l_pl = self._run("pallas_adamw", bucket_bytes=4096)
        assert l_ref == l_pl
        for a, b in zip(
            jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_pl)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestParamCarryDtype:
    """``param_carry_dtype=bf16`` (a bf16 param copy carried across scan
    iterations, forward/backward run against it, f32 master updated from
    ``convert(bf16_grad)``) must be BIT-identical to the default path for
    a bf16-compute model — the default path computes exactly the same
    values via the cast-in-forward and its VJP."""

    @pytest.mark.parametrize("dropout", [0.0, 0.2])
    def test_bit_identical_to_default(self, dropout):
        tr = DeviceDataset.from_numpy(*make_blobs(8, 32, 32, seed=0))
        model = UNet(base_channels=4, dropout=dropout, dtype=jnp.bfloat16)
        cfg = LossConfig(pde_weight=1e-4, phase_field_weight=1e-4)
        idx, valid = epoch_batch_indices(tr.n, 4, shuffle=False)

        final = {}
        for carry in (None, jnp.bfloat16):
            epoch_fn = make_train_epoch_fn(
                model, cfg, compute_metrics=True, param_carry_dtype=carry
            )
            state = create_train_state(
                model, jax.random.key(3), 1e-3, input_shape=(1, 32, 32, 1)
            )
            for _ in range(3):
                state, r = epoch_fn(state, tr.images, tr.masks, idx, valid)
            final[carry is None] = (state.params, r)

        p_ref, r_ref = final[True]
        p_c, r_c = final[False]
        for k in r_ref:
            assert float(r_ref[k]) == float(r_c[k]), k
        for a, b in zip(
            jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_c)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_rejected_with_flat_storage(self):
        tr = DeviceDataset.from_numpy(*make_blobs(4, 32, 32, seed=0))
        model = UNet(base_channels=4, dtype=jnp.bfloat16)
        epoch_fn = make_train_epoch_fn(
            model, LossConfig(), param_carry_dtype=jnp.bfloat16
        )
        state = create_train_state(
            model, jax.random.key(0), 1e-3, input_shape=(1, 32, 32, 1), flat=True
        )
        idx, valid = epoch_batch_indices(tr.n, 4, shuffle=False)
        with pytest.raises(ValueError, match="flat param"):
            epoch_fn(state, tr.images, tr.masks, idx, valid)


class TestMultiEpochProgram:
    """make_train_epochs_fn (E epochs in one dispatch) must be
    bit-identical to E sequential make_train_epoch_fn dispatches."""

    def test_matches_sequential_epochs(self):
        from physics_informed_image_segmentation_tpu.train import (
            make_train_epochs_fn,
        )

        tr = DeviceDataset.from_numpy(*make_blobs(8, 32, 32, seed=0))
        model = UNet(base_channels=4, dropout=0.2)
        cfg = LossConfig(pde_weight=1e-4, phase_field_weight=1e-4)
        e1 = make_train_epoch_fn(model, cfg)
        eN = make_train_epochs_fn(model, cfg)
        idx, valid = epoch_batch_indices(tr.n, 4, shuffle=False)

        s1 = create_train_state(model, jax.random.key(0), 1e-3, input_shape=(1, 32, 32, 1))
        per_epoch = []
        for _ in range(3):
            s1, r1 = e1(s1, tr.images, tr.masks, idx, valid)
            per_epoch.append(float(r1["loss"]))

        s2 = create_train_state(model, jax.random.key(0), 1e-3, input_shape=(1, 32, 32, 1))
        idx3 = jnp.stack([idx] * 3)
        valid3 = jnp.stack([valid] * 3)
        s2, rN = eN(s2, tr.images, tr.masks, idx3, valid3)

        assert rN["loss"].shape == (3,)
        np.testing.assert_array_equal(np.asarray(rN["loss"]), np.asarray(per_epoch))
        for a, b in zip(
            jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(s2.step) == int(s1.step)
