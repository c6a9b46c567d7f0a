"""Real-TPU smoke test (subprocess, skipped when no TPU is reachable).

The main test suite forces CPU (conftest.py) so the 8-device sharding
paths are exercised; this module spawns a clean subprocess WITHOUT that
override and validates the actual TPU paths: Mosaic compilation of the
fused Pallas physics kernel (fwd + custom-VJP bwd) and a jitted train
step on the chip.
"""

import os
import subprocess
import sys
import textwrap

import pytest

_SCRIPT = textwrap.dedent(
    """
    import jax, numpy as np, jax.numpy as jnp
    if jax.default_backend() != "tpu":
        print("NO_TPU")
        raise SystemExit(0)
    from physics_informed_image_segmentation_tpu.ops.pallas_physics import fused_loss_components
    from physics_informed_image_segmentation_tpu.ops import losses
    from physics_informed_image_segmentation_tpu.models import UNet
    from physics_informed_image_segmentation_tpu.train import (
        LossConfig, create_train_state, make_train_epoch_fn)
    from physics_informed_image_segmentation_tpu.data import (
        DeviceDataset, epoch_batch_indices, make_blobs)

    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.uniform(0.1, 0.9, (8, 128, 128)).astype(np.float32))
    t = jnp.asarray((rng.uniform(size=(8, 128, 128)) > 0.5).astype(np.float32))

    def total(p):
        c = fused_loss_components(p, t, diffusion_coeff=5.0, epsilon=0.05)
        return (0.5 * c["dice_loss"] + 0.5 * c["bce_loss"]
                + 1e-4 * c["pde_loss"] + 1e-4 * c["phase_field_loss"])

    def total_pure(p):
        return losses.dice_bce_pde_loss(
            p, t, pde_weight=1e-4, phase_field_weight=1e-4, diffusion_coeff=5.0)

    g = jax.jit(jax.grad(total))(pred)
    g2 = jax.jit(jax.grad(total_pure))(pred)
    gdiff = float(jnp.abs(g - g2).max())
    fdiff = abs(float(jax.jit(total)(pred)) - float(jax.jit(total_pure)(pred)))
    assert gdiff < 1e-5, f"pallas bwd mismatch on TPU: {gdiff}"
    assert fdiff < 1e-6, f"pallas fwd mismatch on TPU: {fdiff}"

    # padded-block kernel (spatial-parallel local compute) compiles on TPU
    from physics_informed_image_segmentation_tpu.ops import pde as pde_ops
    from physics_informed_image_segmentation_tpu.ops.pallas_physics import (
        padded_physics_sums,
    )

    pp = jnp.pad(pred, ((0, 0), (1, 1), (1, 1)), mode="reflect")

    def padded_total(v):
        s = padded_physics_sums(v, 5.0, 0.5, 0.05, True)
        return jnp.sum(s) / pred.size

    gp = jax.jit(jax.grad(padded_total))(pp)
    assert np.isfinite(np.asarray(gp)).all()

    # odd, non-tile-aligned shapes must lower too (Mosaic masking paths)
    odd = jnp.asarray(rng.uniform(0.1, 0.9, (3, 96, 72)).astype(np.float32))
    odd_t = jnp.asarray((rng.uniform(size=(3, 96, 72)) > 0.5).astype(np.float32))
    c_odd = jax.jit(
        lambda p: fused_loss_components(p, odd_t, diffusion_coeff=5.0)["pde_loss"]
    )
    v_odd = float(c_odd(odd))
    v_ref_odd = float(
        losses.dice_bce_pde_loss(odd, odd_t, pde_weight=1.0, phase_field_weight=0.0,
                                 diffusion_coeff=5.0)
        - losses.dice_bce_loss(odd, odd_t)
    )
    assert abs(v_odd - v_ref_odd) < 1e-4 * max(1.0, abs(v_ref_odd)), (v_odd, v_ref_odd)
    g_odd = jax.jit(jax.grad(lambda p: c_odd(p)))(odd)
    assert np.isfinite(np.asarray(g_odd)).all()
    v_pad = float(jax.jit(lambda v: jnp.sum(padded_physics_sums(v, 5.0, 0.5, 0.05, True)[:, 0]))(pp))
    v_ref = float(pde_ops.pde_residual_loss(pred, 5.0, 0.5)) * pred.size
    assert abs(v_pad - v_ref) / abs(v_ref) < 1e-5, (v_pad, v_ref)

    # the FULL halo + fused-Pallas physics path on hardware: a 1-device
    # mesh exercises the padded kernel's mirror-edge (global Neumann)
    # branch through the real shard_map + ppermute wrapper — this is the
    # Mosaic compile the CPU dryrun only interprets
    from jax.sharding import Mesh
    from physics_informed_image_segmentation_tpu.parallel.halo import (
        halo_physics_loss_pallas,
    )

    mesh1 = Mesh(np.array(jax.devices()[:1]), ("space",))
    rd_halo, pf_halo = jax.jit(
        lambda v: halo_physics_loss_pallas(v, mesh1, 5.0, 0.5, 0.05, True)
    )(pred)
    rd_ref = float(pde_ops.pde_residual_loss(pred, 5.0, 0.5))
    pf_ref = float(pde_ops.phase_field_loss(pred, 0.05))
    assert abs(float(rd_halo) - rd_ref) / rd_ref < 1e-5, (float(rd_halo), rd_ref)
    assert abs(float(pf_halo) - pf_ref) / pf_ref < 1e-5, (float(pf_halo), pf_ref)
    g_halo = jax.jit(
        jax.grad(lambda v: halo_physics_loss_pallas(v, mesh1, 5.0, 0.5, 0.05, True)[0])
    )(pred)
    assert np.isfinite(np.asarray(g_halo)).all()
    print("HALO_PALLAS_TPU_OK")

    # one real train epoch on the chip (bf16, pallas loss, on-device metrics)
    data = DeviceDataset.from_numpy(*make_blobs(32, 128, 128, seed=0))
    model = UNet(base_channels=64, dtype=jnp.bfloat16)
    cfg = LossConfig(pde_weight=1e-4, phase_field_weight=1e-4, diffusion_coeff=5.0)
    fn = make_train_epoch_fn(model, cfg)
    state = create_train_state(model, jax.random.key(0), 1e-4,
                               input_shape=(1, 128, 128, 1))
    idx, valid = epoch_batch_indices(data.n, 8, shuffle=True, key=jax.random.key(1))
    state, r = fn(state, data.images, data.masks, idx, valid)
    loss = float(r["loss"])
    assert np.isfinite(loss)
    print(f"TPU_OK loss={loss:.4f} pallas_grad_diff={gdiff:.2e}")
    """
)


@pytest.mark.slow
def test_tpu_pallas_and_train_step():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the axon plugin pick the TPU
    env["JAX_PLATFORMS"] = "axon"
    try:
        result = subprocess.run(
            [sys.executable, "-c", _SCRIPT],
            capture_output=True,
            text=True,
            timeout=600,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
    except subprocess.TimeoutExpired:
        # the axon TPU tunnel intermittently hangs for minutes at a time
        # (see CLAUDE.md); that is an infrastructure condition, not a
        # code failure — don't fail the suite on it
        pytest.skip("TPU tunnel unresponsive (known intermittent hang)")
    out = result.stdout + result.stderr
    if "NO_TPU" in result.stdout:
        pytest.skip("no TPU attached")
    assert result.returncode == 0, out
    assert "HALO_PALLAS_TPU_OK" in result.stdout, out
    assert "TPU_OK" in result.stdout, out
