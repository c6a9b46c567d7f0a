"""Bucketed multi-ref Pallas AdamW: the per-leaf update tail, fused.

The profiled train step spends ~1.38 ms in 45 per-leaf XLA
``multiply_add_fusion``s whose cost is scheduling, not bandwidth
(small leaves stall ~110 us each; pure traffic would cost ~0.58 ms —
scripts/profile_step.py).  Flattening params or moments into one
vector makes it WORSE (tiled<->linear relayout copies, see
train/optim.py docstring).  The remaining move: update many leaves
*in their native tiled layouts* inside ONE kernel — Pallas refs keep
each leaf's own shape/layout, so there is no relayout, and
``input_output_aliases`` makes p/m/v updates in-place.

Leaves are greedily packed (largest first) into buckets capped by a
VMEM budget; each bucket is one blockless ``pallas_call`` whose body
is unrolled over its leaves.  Math is elementwise-identical to
``optax.adamw`` (same formulas in the same order — see
train/optim.py), so trajectories match bit-for-bit; pinned by
tests/test_perf_equiv.py vs optax on CPU (interpret mode) and used on
TPU via ``create_train_state(optimizer="pallas_adamw")``.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["pallas_adamw", "PallasAdamWState"]

# Mosaic's scoped-vmem limit is 16 MiB per kernel; a bucket keeps
# ~4x its bytes as inputs + ~3x as (aliased) outputs + temps live, so
# cap buckets ~1.5 MiB.  Leaves larger than the cap stay on XLA's
# per-leaf fusions — the profile shows those big-leaf fusions already
# run at HBM bandwidth; it is the SMALL/medium leaves that stall
# (~0.58 ms across ~35 fusions), and those are what get bucketed.
_BUCKET_BYTES = 3 * 2**19


class PallasAdamWState(NamedTuple):
    count: jax.Array
    m: Any  # pytree like params
    v: Any  # pytree like params


def _make_bucket_kernel(n: int):
    """Kernel over ``n`` leaves: refs = [bc, g*n, p*n, m*n, v*n] then
    outputs [new_p*n, new_m*n, new_v*n].  ``bc`` is a (1, 4) SMEM array
    holding (bc1, bc2, lr, wd)."""

    def kernel(bc_ref, *refs):
        g_refs = refs[0:n]
        p_refs = refs[n : 2 * n]
        m_refs = refs[2 * n : 3 * n]
        v_refs = refs[3 * n : 4 * n]
        op_refs = refs[4 * n : 5 * n]
        om_refs = refs[5 * n : 6 * n]
        ov_refs = refs[6 * n : 7 * n]
        bc1 = bc_ref[0, 0]
        bc2 = bc_ref[0, 1]
        lr = bc_ref[0, 2]
        wd = bc_ref[0, 3]
        for i in range(n):
            g = g_refs[i][...]
            p = p_refs[i][...]
            m = m_refs[i][...]
            v = v_refs[i][...]
            # optax.scale_by_adam formulas, same op order (train/optim.py)
            m_new = (1.0 - 0.9) * g + 0.9 * m
            v_new = (1.0 - 0.999) * (g * g) + 0.999 * v
            u = (m_new / bc1) / (jnp.sqrt(v_new / bc2) + 1e-8)
            op_refs[i][...] = p + (-lr) * (u + wd * p)
            om_refs[i][...] = m_new
            ov_refs[i][...] = v_new

    return kernel


def _buckets(leaves) -> list[list[int]]:
    """Greedy largest-first packing of leaf indices under the byte cap."""
    order = sorted(range(len(leaves)), key=lambda i: -leaves[i].size)
    buckets: list[list[int]] = []
    sizes: list[int] = []
    for i in order:
        b = leaves[i].size * leaves[i].dtype.itemsize
        placed = False
        for k in range(len(buckets)):
            if sizes[k] + b <= _BUCKET_BYTES:
                buckets[k].append(i)
                sizes[k] += b
                placed = True
                break
        if not placed:
            buckets.append([i])
            sizes.append(b)
    return buckets


@functools.partial(jax.jit, static_argnums=(5, 6))
def _fused_update(bc, params_leaves, m_leaves, v_leaves, g_leaves, buckets, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    new_p = list(params_leaves)
    new_m = list(m_leaves)
    new_v = list(v_leaves)
    for idxs in buckets:
        n = len(idxs)
        kern = _make_bucket_kernel(n)
        g = [g_leaves[i] for i in idxs]
        p = [params_leaves[i] for i in idxs]
        m = [m_leaves[i] for i in idxs]
        v = [v_leaves[i] for i in idxs]
        shapes = [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in p]
        out = pl.pallas_call(
            kern,
            out_shape=shapes + shapes + shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (4 * n),
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 * n),
            # inputs are ordered [bc, g*n, p*n, m*n, v*n]; outputs
            # [p*n, m*n, v*n] alias the p/m/v inputs in place
            input_output_aliases={
                **{1 + n + i: i for i in range(n)},
                **{1 + 2 * n + i: n + i for i in range(n)},
                **{1 + 3 * n + i: 2 * n + i for i in range(n)},
            },
            interpret=interpret,
        )(bc, *g, *p, *m, *v)
        for j, i in enumerate(idxs):
            new_p[i] = out[j]
            new_m[i] = out[n + j]
            new_v[i] = out[2 * n + j]
    return new_p, new_m, new_v


def pallas_adamw(
    learning_rate: float,
    weight_decay: float = 1e-5,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    interpret: bool | None = None,
):
    """AdamW whose whole update runs as a handful of multi-leaf Pallas
    kernels.  Returned object is optax-like (``init``) but applies
    params directly via ``fused_apply_gradients`` (TrainState detects
    it).  ``interpret=None`` auto-selects interpret mode off-TPU."""
    if b1 != 0.9 or b2 != 0.999 or eps != 1e-8:
        raise ValueError("pallas_adamw is specialised to default b1/b2/eps")

    class _Tx:
        def init(self, params):
            zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
            return PallasAdamWState(
                count=jnp.zeros((), jnp.int32),
                m=zeros,
                v=jax.tree_util.tree_map(jnp.zeros_like, params),
            )

        def fused_apply_gradients(self, grads, state, params):
            run_interpret = (
                jax.default_backend() != "tpu" if interpret is None else interpret
            )
            count = optax.safe_int32_increment(state.count)
            bc1 = 1 - b1**count
            bc2 = 1 - b2**count
            bc = jnp.stack(
                [bc1, bc2, jnp.float32(learning_rate), jnp.float32(weight_decay)]
            ).reshape(1, 4).astype(jnp.float32)

            p_leaves, treedef = jax.tree_util.tree_flatten(params)
            g_leaves = jax.tree_util.tree_leaves(grads)
            m_leaves = jax.tree_util.tree_leaves(state.m)
            v_leaves = jax.tree_util.tree_leaves(state.v)

            small = [
                i
                for i, x in enumerate(p_leaves)
                if x.size * x.dtype.itemsize <= _BUCKET_BYTES
            ]
            buckets = tuple(
                tuple(b) for b in _buckets([p_leaves[i] for i in small])
            )
            # map bucket-local indices back to global leaf indices
            buckets = tuple(tuple(small[j] for j in b) for b in buckets)

            new_p, new_m, new_v = _fused_update(
                bc, p_leaves, m_leaves, v_leaves, g_leaves, buckets, run_interpret
            )
            # big leaves: plain XLA with the identical formulas (their
            # per-leaf fusions are already bandwidth-optimal)
            in_bucket = {i for b in buckets for i in b}
            bc1f = bc[0, 0]
            bc2f = bc[0, 1]
            for i in range(len(p_leaves)):
                if i in in_bucket:
                    continue
                g, pp, mm, vv = g_leaves[i], p_leaves[i], m_leaves[i], v_leaves[i]
                m_new = (1.0 - b1) * g + b1 * mm
                v_new = (1.0 - b2) * (g * g) + b2 * vv
                u = (m_new / bc1f) / (jnp.sqrt(v_new / bc2f) + eps)
                new_p[i] = pp + (-learning_rate) * (u + weight_decay * pp)
                new_m[i] = m_new
                new_v[i] = v_new

            unflatten = treedef.unflatten
            return unflatten(new_p), PallasAdamWState(
                count=count, m=unflatten(new_m), v=unflatten(new_v)
            )

        # optax-compat fallback (same formulas, plain XLA) so generic
        # code paths that expect (updates, state) still work
        def update(self, grads, state, params=None):
            if params is None:
                raise ValueError("pallas_adamw requires params (weight decay)")
            count = optax.safe_int32_increment(state.count)
            m = jax.tree_util.tree_map(
                lambda g, t: (1 - b1) * g + b1 * t, grads, state.m
            )
            v = jax.tree_util.tree_map(
                lambda g, t: (1 - b2) * (g * g) + b2 * t, grads, state.v
            )
            mhat = optax.tree.bias_correction(m, b1, count)
            vhat = optax.tree.bias_correction(v, b2, count)
            updates = jax.tree_util.tree_map(
                lambda mh, vh, p: -learning_rate
                * (mh / (jnp.sqrt(vh) + eps) + weight_decay * p),
                mhat,
                vhat,
                params,
            )
            return updates, PallasAdamWState(count=count, m=m, v=v)

    return _Tx()
