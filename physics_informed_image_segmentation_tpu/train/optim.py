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

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

__all__ = ["flat_adamw", "FlatAdamWState"]


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
