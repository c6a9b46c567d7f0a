"""Megapixel-scale training demo: space-sharded U-Net at 1024x1024.

Demonstrates the memory story of the halo/spatial machinery (SURVEY §5
long-context analogue; VERDICT r1 item 7): the same train step that
OOMs — or needs the whole activation footprint on one chip — fits when
the image height is sharded over the ``space`` mesh axis, with remat
shrinking it further.

Uses XLA's static memory analysis of the COMPILED step (argument +
temp/activation bytes per device), so the comparison is exact and does
not depend on host RAM; it then executes one real sharded step on the
8-virtual-device CPU mesh to prove the program runs end to end.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/megapixel_demo.py [H] [base_channels]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from physics_informed_image_segmentation_tpu.models import UNet  # noqa: E402
from physics_informed_image_segmentation_tpu.parallel import (  # noqa: E402
    batch_space_sharding,
    make_mesh,
    make_sharded_train_step,
    shard_train_state,
)
from physics_informed_image_segmentation_tpu.train import (  # noqa: E402
    LossConfig,
    create_train_state,
)


def gib(n) -> str:
    return f"{n / 2**30:.2f} GiB"


def analyze(h: int, base_channels: int, space: int, remat: bool, execute: bool):
    mesh = make_mesh(data=1, space=space)
    model = UNet(
        in_channels=1, out_channels=1, base_channels=base_channels,
        remat=remat, dtype=jnp.bfloat16,
    )
    cfg = LossConfig(
        pde_weight=1e-4, phase_field_weight=1e-4, diffusion_coeff=5.0,
        backend="jax",
    )
    state = create_train_state(model, jax.random.key(0), 1e-4, input_shape=(1, 64, 64, 1))
    state = shard_train_state(state, mesh)
    step = make_sharded_train_step(model, cfg, mesh, spatial=space > 1)

    sh = batch_space_sharding(mesh)
    x_spec = jax.ShapeDtypeStruct((1, h, h, 1), jnp.float32, sharding=sh)
    y_spec = jax.ShapeDtypeStruct((1, h, h, 1), jnp.float32, sharding=sh)
    compiled = jax.jit(step).lower(state, x_spec, y_spec).compile()
    m = compiled.memory_analysis()
    label = f"H={h} bc={base_channels} space={space} remat={int(remat)}"
    if m is not None:
        print(
            f"{label}: temp={gib(m.temp_size_in_bytes)} "
            f"args={gib(m.argument_size_in_bytes)} "
            f"out={gib(m.output_size_in_bytes)} "
            f"peak(temp+args)={gib(m.temp_size_in_bytes + m.argument_size_in_bytes)}",
            flush=True,
        )
    else:
        print(f"{label}: memory_analysis unavailable on this backend", flush=True)

    if execute:
        x = jax.device_put(jnp.zeros((1, h, h, 1), jnp.float32), sh)
        y = jax.device_put(jnp.zeros((1, h, h, 1), jnp.float32), sh)
        t0 = time.perf_counter()
        state, loss = compiled(state, x, y)
        val = float(loss)
        print(f"{label}: one real step OK, loss={val:.4f}, {time.perf_counter()-t0:.1f}s", flush=True)
    return m


if __name__ == "__main__":
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    bc = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    # memory story at full flagship width (compile-only: exact XLA
    # accounting without needing the RAM to run all variants)
    analyze(h, bc, space=1, remat=False, execute=False)
    analyze(h, bc, space=8, remat=False, execute=False)
    analyze(h, bc, space=8, remat=True, execute=False)
    # prove the sharded+remat program actually executes end to end
    # (smaller width so one CPU step stays in seconds, same program shape)
    analyze(h, 16, space=8, remat=True, execute=True)
