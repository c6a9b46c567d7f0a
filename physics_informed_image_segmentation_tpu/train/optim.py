"""AdamW with flat moment storage — one fused update instead of 45.

``optax.adamw`` keeps first/second moments as pytrees mirroring the
params; XLA then emits one multiply-add fusion per leaf, and on TPU the
46-leaf U-Net pays ~1.4 ms/step in those fusions where the pure HBM
traffic costs ~0.6 ms (profiled: small leaves stall ~110 us each,
scripts/profile_step.py — scheduling/DMA-queue overhead, not
bandwidth).

:func:`flat_adamw` stores ``m``/``v`` as single flat vectors and runs
the entire scale-by-adam pass as one fused elementwise op over 20.5M
elements; only the final weight-decay + learning-rate application
touches per-leaf arrays (it must — params legitimately live as conv
kernels).  The math is ELEMENTWISE-IDENTICAL to ``optax.adamw`` in the
same order:

    m <- b1 m + (1-b1) g            v <- b2 v + (1-b2) g^2
    mhat = m / (1 - b1^t)           vhat = v / (1 - b2^t)
    update = -lr * (mhat / (sqrt(vhat) + eps) + wd * p)

so trajectories are bit-identical (tests/test_perf_equiv.py pins this).
Params stay a pytree — this deliberately does NOT flatten params
(measured: unravel-for-apply forces conv-kernel relayout copies and
costs ~1 ms/step, scripts/ab_bench.py round 2).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

__all__ = [
    "flat_adamw",
    "FlatAdamWState",
    "grouped_adamw",
    "GroupedAdamWState",
    "low_precision_adamw",
    "LowPrecisionAdamWState",
]


class FlatAdamWState(NamedTuple):
    count: jax.Array  # int32 step counter
    m: jax.Array  # (n_params,) first moment
    v: jax.Array  # (n_params,) second moment


def flat_adamw(
    learning_rate: float,
    weight_decay: float = 1e-5,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Drop-in for ``optax.adamw(learning_rate, weight_decay=...)``."""

    def init_fn(params):
        flat, _ = ravel_pytree(params)
        return FlatAdamWState(
            count=jnp.zeros((), jnp.int32),
            m=jnp.zeros_like(flat),
            v=jnp.zeros_like(flat),
        )

    def update_fn(grads, state, params=None):
        if params is None:
            raise ValueError("flat_adamw requires params (weight decay)")
        g, unravel = ravel_pytree(grads)
        count = optax.safe_int32_increment(state.count)
        # same formulations as optax.scale_by_adam (optax.tree helpers
        # accept bare arrays), so every elementwise op matches bit-for-bit
        m = optax.tree.update_moment(g, state.m, b1, 1)
        v = optax.tree.update_moment_per_elem_norm(g, state.v, b2, 2)
        mhat = optax.tree.bias_correction(m, b1, count)
        vhat = optax.tree.bias_correction(v, b2, count)
        u = mhat / (jnp.sqrt(vhat) + eps)
        u_tree = unravel(u)
        updates = jax.tree_util.tree_map(
            lambda ul, p: -learning_rate * (ul + weight_decay * p), u_tree, params
        )
        return updates, FlatAdamWState(count=count, m=m, v=v)

    return optax.GradientTransformation(init_fn, update_fn)


class LowPrecisionAdamWState(NamedTuple):
    count: jax.Array  # int32 step counter
    m: Any  # first-moment pytree in ``m_dtype``
    v: Any  # second-moment pytree in ``v_dtype``


def low_precision_adamw(
    learning_rate: float,
    weight_decay: float = 1e-5,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    m_dtype=jnp.bfloat16,
    v_dtype=jnp.float32,
) -> optax.GradientTransformation:
    """AdamW with reduced-precision moment STORAGE (compute stays f32).

    The optimizer pass is pure HBM traffic (read m/v/params/grads,
    write m/v/params); storing a moment in bf16 halves its share.  This
    is a NON-parity option: the per-step round-trip quantises the
    moments, so trajectories drift from ``optax.adamw`` (unlike the
    bf16 *param carry*, which is bit-identical).

    Dtype guidance (why the default is m-only):

    * ``m`` in bf16 is benign — b1=0.9 moves m by ~10%/step, far above
      bf16's ~0.4% resolution, so the EMA tracks faithfully.
    * ``v`` in bf16 is NOT: with b2=0.999 both the decay (0.1%) and the
      increment (~0.1% of v in steady state) sit BELOW one bf16 ulp, so
      a stored-rounded v can absorb neither and sticks at a stale
      scale.  ``v_dtype=jnp.bfloat16`` is accepted for measurement but
      convergence-test before trusting it (see DESIGN.md §7).
    """

    def init_fn(params):
        return LowPrecisionAdamWState(
            count=jnp.zeros((), jnp.int32),
            m=jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, m_dtype), params
            ),
            v=jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, v_dtype), params
            ),
        )

    def update_fn(grads, state, params=None):
        if params is None:
            raise ValueError("low_precision_adamw requires params (weight decay)")
        count = optax.safe_int32_increment(state.count)
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)

        def leaf(g, m, v, p):
            g32 = g.astype(jnp.float32)
            m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g32
            v32 = b2 * v.astype(jnp.float32) + (1.0 - b2) * (g32 * g32)
            u = (m32 / bc1) / (jnp.sqrt(v32 / bc2) + eps)
            upd = -learning_rate * (u + weight_decay * p)
            return upd, m32.astype(m_dtype), v32.astype(v_dtype)

        out = jax.tree_util.tree_map(leaf, grads, state.m, state.v, params)
        treedef = jax.tree_util.tree_structure(grads)
        leaves = treedef.flatten_up_to(out)
        updates = jax.tree_util.tree_unflatten(treedef, [x[0] for x in leaves])
        new_m = jax.tree_util.tree_unflatten(treedef, [x[1] for x in leaves])
        new_v = jax.tree_util.tree_unflatten(treedef, [x[2] for x in leaves])
        return updates, LowPrecisionAdamWState(count=count, m=new_m, v=new_v)

    return optax.GradientTransformation(init_fn, update_fn)


class GroupedAdamWState(NamedTuple):
    count: jax.Array  # int32 step counter
    m_flat: jax.Array  # (n_small,) first moment of grouped small leaves
    v_flat: jax.Array  # (n_small,) second moment of grouped small leaves
    m_big: Any  # tuple of per-leaf first moments (large leaves)
    v_big: Any  # tuple of per-leaf second moments (large leaves)


def grouped_adamw(
    learning_rate: float,
    weight_decay: float = 1e-5,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    max_group_elems: int = 1_400_000,
) -> optax.GradientTransformation:
    """AdamW with SMALL leaves updated as one flat fused op, big leaves native.

    Motivation (TPU profile, scripts/profile_step.py round 2): the per-leaf
    ``multiply_add_fusion``s for mid-size conv kernels (37k–1.2M elements)
    each run 100–130 us — far off their HBM-traffic cost (1–35 us) — while
    the biggest leaves ([3,3,512,512]+) already run at bandwidth.  Flattening
    EVERYTHING (``flat_adamw``) pays tiled<->linear relayout copies on the
    big kernels and measured slower; this hybrid groups only the leaves
    below ``max_group_elems`` (default keeps [3,3,512,256] and smaller,
    ~6M of the 20.5M params) into one flat moment buffer + one fused
    update, and leaves the bandwidth-bound big kernels on XLA's per-leaf
    fusions.

    Math is elementwise-identical to ``optax.adamw`` (same formulations in
    the same order for both groups), so trajectories are bit-identical —
    pinned by tests/test_perf_equiv.py.
    """

    def _small_idx(leaves):
        return [i for i, leaf in enumerate(leaves) if leaf.size <= max_group_elems]

    def init_fn(params):
        leaves = jax.tree_util.tree_leaves(params)
        small = _small_idx(leaves)
        small_set = set(small)
        n_small = sum(leaves[i].size for i in small)
        big = tuple(
            jnp.zeros_like(leaf)
            for i, leaf in enumerate(leaves)
            if i not in small_set
        )
        return GroupedAdamWState(
            count=jnp.zeros((), jnp.int32),
            m_flat=jnp.zeros((n_small,), jnp.float32),
            v_flat=jnp.zeros((n_small,), jnp.float32),
            m_big=big,
            v_big=tuple(jnp.zeros_like(b) for b in big),
        )

    def update_fn(grads, state, params=None):
        if params is None:
            raise ValueError("grouped_adamw requires params (weight decay)")
        g_leaves, treedef = jax.tree_util.tree_flatten(grads)
        p_leaves = treedef.flatten_up_to(params)
        small = _small_idx(g_leaves)
        small_set = set(small)
        count = optax.safe_int32_increment(state.count)

        updates = [None] * len(g_leaves)
        # --- grouped small leaves: one fused elementwise pass ---
        if small:
            g_flat = jnp.concatenate(
                [g_leaves[i].reshape(-1).astype(jnp.float32) for i in small]
            )
            m = optax.tree.update_moment(g_flat, state.m_flat, b1, 1)
            v = optax.tree.update_moment_per_elem_norm(g_flat, state.v_flat, b2, 2)
            mhat = optax.tree.bias_correction(m, b1, count)
            vhat = optax.tree.bias_correction(v, b2, count)
            u = mhat / (jnp.sqrt(vhat) + eps)
            off = 0
            for i in small:
                size = g_leaves[i].size
                u_leaf = u[off : off + size].reshape(g_leaves[i].shape)
                updates[i] = -learning_rate * (
                    u_leaf + weight_decay * p_leaves[i]
                )
                off += size
        else:
            m = state.m_flat
            v = state.v_flat
        # --- big leaves: per-leaf, exactly like optax.adamw ---
        m_big, v_big = [], []
        for j, i in enumerate(k for k in range(len(g_leaves)) if k not in small_set):
            g_leaf = g_leaves[i]
            m_leaf = optax.tree.update_moment(g_leaf, state.m_big[j], b1, 1)
            v_leaf = optax.tree.update_moment_per_elem_norm(
                g_leaf, state.v_big[j], b2, 2
            )
            mhat = optax.tree.bias_correction(m_leaf, b1, count)
            vhat = optax.tree.bias_correction(v_leaf, b2, count)
            updates[i] = -learning_rate * (
                mhat / (jnp.sqrt(vhat) + eps) + weight_decay * p_leaves[i]
            )
            m_big.append(m_leaf)
            v_big.append(v_leaf)
        return (
            jax.tree_util.tree_unflatten(treedef, updates),
            GroupedAdamWState(
                count=count,
                m_flat=m,
                v_flat=v,
                m_big=tuple(m_big),
                v_big=tuple(v_big),
            ),
        )

    return optax.GradientTransformation(init_fn, update_fn)
