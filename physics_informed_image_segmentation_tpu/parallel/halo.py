"""Explicit halo-exchange stencils for spatially-sharded fields.

The spatial analogue of context/sequence parallelism for this framework
(SURVEY.md §5): the PDE stencils are 3×3-local, so a megapixel
segmentation field can be sharded across devices along image height
with only a 1-row halo exchanged per step.  XLA already auto-halos
convs under `with_sharding_constraint`; this module is the *explicit*
shard_map + `ppermute` implementation — it gives deterministic,
inspectable communication (one bidirectional neighbor exchange over
ICI) and is the pattern to extend when fields stop fitting on one chip.

Boundary semantics match the reference physics exactly: mirror
(Neumann) at the *global* top/bottom edges, real neighbor rows at
interior shard boundaries, mirror at left/right edges (W is unsharded).
Validated against the unsharded ops in ``tests/test_parallel.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .mesh import SPACE_AXIS

__all__ = [
    "halo_exchange_pad",
    "halo_residual_loss",
    "halo_phase_field_loss",
    "halo_physics_loss_pallas",
]


def halo_exchange_pad(u_local: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """(B, H_loc, W) shard → (B, H_loc+2, W+2) with halo rows + mirror edges.

    Row halos come from the neighbouring shards via two `ppermute`s
    (up and down); the first/last shard mirror-pads instead (global
    Neumann edge).  Columns are mirror-padded locally.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    if n > 1:
        # my last row -> next shard's top ghost; my first row -> prev's bottom
        from_above = jax.lax.ppermute(
            u_local[:, -1:, :], axis_name, [(i, i + 1) for i in range(n - 1)]
        )
        from_below = jax.lax.ppermute(
            u_local[:, :1, :], axis_name, [(i + 1, i) for i in range(n - 1)]
        )
    else:
        from_above = jnp.zeros_like(u_local[:, :1, :])
        from_below = jnp.zeros_like(u_local[:, :1, :])

    # global edges mirror (reflect excludes the edge row: ghost = row 1)
    top = jnp.where(idx == 0, u_local[:, 1:2, :], from_above)
    bot = jnp.where(idx == n - 1, u_local[:, -2:-1, :], from_below)
    p = jnp.concatenate([top, u_local, bot], axis=1)
    return jnp.concatenate([p[:, :, 1:2], p, p[:, :, -2:-1]], axis=2)


def _local_sums(p, h, w, D, a, eps):
    """Stencil partial sums from a halo-padded local block."""
    u = p[:, 1:-1, 1:-1]
    up = p[:, :-2, 1:-1]
    down = p[:, 2:, 1:-1]
    left = p[:, 1:-1, :-2]
    right = p[:, 1:-1, 2:]
    lap = up + down + left + right - 4.0 * u
    r = D * lap + u * (1.0 - u) * (u - a)
    gx = 0.5 * (right - left)
    gy = 0.5 * (down - up)
    one_minus = 1.0 - u
    pf = (eps / 2.0) * (gx * gx + gy * gy) + (1.0 / eps) * (u * u) * (
        one_minus * one_minus
    )
    return jnp.sum(r * r), jnp.sum(pf)


def _make_halo_loss(mesh: Mesh, which: str, D: float, a: float, eps: float):
    spec = P(None, SPACE_AXIS, None)

    def local(u_local):
        p = halo_exchange_pad(u_local, SPACE_AXIS)
        rd, pf = _local_sums(p, u_local.shape[1], u_local.shape[2], D, a, eps)
        total = jax.lax.psum(rd if which == "rd" else pf, SPACE_AXIS)
        count = jax.lax.psum(
            jnp.asarray(u_local.size, jnp.float32), SPACE_AXIS
        )
        return total / count

    return shard_map(local, mesh=mesh, in_specs=spec, out_specs=P())


def halo_residual_loss(
    u: jnp.ndarray,
    mesh: Mesh,
    diffusion_coeff: float = 1.0,
    reaction_threshold: float = 0.5,
) -> jnp.ndarray:
    """``mean(r²)`` of the RD residual on an H-sharded (B, H, W) field.

    Numerically identical to
    :func:`physics_informed_image_segmentation_tpu.ops.pde.pde_residual_loss`
    on the gathered field; communication = one bidirectional 1-row halo
    `ppermute` + scalar psum.
    """
    fn = _make_halo_loss(mesh, "rd", diffusion_coeff, reaction_threshold, 0.05)
    return fn(u)


def halo_phase_field_loss(
    u: jnp.ndarray, mesh: Mesh, epsilon: float = 0.05
) -> jnp.ndarray:
    """Phase-field energy on an H-sharded field (see halo_residual_loss)."""
    fn = _make_halo_loss(mesh, "pf", 1.0, 0.5, epsilon)
    return fn(u)


def halo_physics_loss_pallas(
    u: jnp.ndarray,
    mesh: Mesh,
    diffusion_coeff: float = 1.0,
    reaction_threshold: float = 0.5,
    epsilon: float = 0.05,
    use_reaction_term: bool = True,
    batch_axis: str | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Both physics losses on an H-sharded field with the FUSED Pallas
    kernel doing the local compute.

    The division of labour is the production pattern for megapixel
    fields: `ppermute` halo exchange (XLA collective over ICI) fills the
    ghost ring, one fused Pallas pass computes both energies from VMEM,
    and a scalar `psum` reduces across shards.  Differentiable end to
    end — the kernel's custom VJP produces gradients w.r.t. the padded
    block and shard_map AD transposes the ppermute for the halo rows.

    ``batch_axis``: when the field's batch dimension is ALSO sharded
    (e.g. inside a data×space-parallel train step), name that mesh axis
    so the reduction averages over the global batch.

    Returns ``(mean(r²), mean(phase_field))``.
    """
    from ..ops.pallas_physics import padded_physics_sums

    spec = P(batch_axis, SPACE_AXIS, None)
    reduce_axes = (SPACE_AXIS,) if batch_axis is None else (batch_axis, SPACE_AXIS)

    def local(u_local):
        p = halo_exchange_pad(u_local, SPACE_AXIS)
        sums = padded_physics_sums(
            p, diffusion_coeff, reaction_threshold, epsilon, use_reaction_term
        )
        rd = jax.lax.psum(jnp.sum(sums[:, 0]), reduce_axes)
        pf = jax.lax.psum(jnp.sum(sums[:, 1]), reduce_axes)
        count = jax.lax.psum(jnp.asarray(u_local.size, jnp.float32), reduce_axes)
        return rd / count, pf / count

    # check_vma=False: pallas_call outputs don't carry varying-mesh-axis
    # metadata yet, so the collective-safety check must be disabled here
    return shard_map(
        local, mesh=mesh, in_specs=spec, out_specs=(P(), P()), check_vma=False
    )(u)
