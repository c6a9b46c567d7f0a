"""Two-process `jax.distributed` execution of the comm backend.

Every other parallel surface is equivalence-tested on the 8-device
virtual CPU mesh inside ONE process; this test executes the real
multi-process path — `initialize_distributed` (the framework's
equivalent of the distributed backend the reference lacks, SURVEY.md
§2 P3) — by spawning two coordinated worker processes, each with 4
local CPU devices (gloo cross-process collectives), building the
8-device global mesh, and running one psum and one sharded train step.
The parent process runs the identical step single-process and asserts
numeric agreement, so the multi-process path is proven equal to the
tested-everywhere single-process path, not just "it didn't crash".
"""

import json
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import jax
import numpy as np
import pytest

from physics_informed_image_segmentation_tpu.data import make_blobs
from physics_informed_image_segmentation_tpu.models import UNet
from physics_informed_image_segmentation_tpu.parallel import (
    batch_sharding,
    make_mesh,
    make_sharded_train_step,
    shard_train_state,
)
from physics_informed_image_segmentation_tpu.train import (
    LossConfig,
    create_train_state,
)

REPO = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.slow

WORKER = textwrap.dedent(
    """
    import json, os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    pid, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    sys.path.insert(0, {repo!r})

    from physics_informed_image_segmentation_tpu.parallel import (
        initialize_distributed)

    # must run before anything touches the XLA backend
    initialize_distributed(f"localhost:{{port}}", num_processes=2,
                           process_id=pid)

    from physics_informed_image_segmentation_tpu.data import make_blobs
    from physics_informed_image_segmentation_tpu.models import UNet
    from physics_informed_image_segmentation_tpu.parallel import (
        batch_sharding, make_mesh, make_sharded_train_step, replicated,
        shard_train_state)
    from physics_informed_image_segmentation_tpu.train import (
        LossConfig, create_train_state)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 8

    # idempotence: a second call must be a no-op, not a crash
    initialize_distributed(f"localhost:{{port}}", num_processes=2,
                           process_id=pid)

    # Coordination-service barriers before every cross-process
    # collective: gloo's rendezvous has a hard 30s timeout, and on a
    # 1-vCPU host the two workers' jit compiles serialise, so without
    # barriers the faster process times out waiting inside a collective
    # while the slower one is still compiling.
    from jax._src import distributed as _dist

    def barrier(name):
        _dist.global_state.client.wait_at_barrier(name, 600_000)

    mesh = make_mesh()  # (data=8, space=1) over the global devices
    import jax.numpy as jnp

    # one explicit collective over the global mesh
    barrier("b_psum")
    ones = jax.jit(
        lambda: jnp.ones(()), out_shardings=replicated(mesh)
    )()
    psum_n = float(jax.jit(
        lambda x: x * len(jax.devices()), out_shardings=replicated(mesh)
    )(ones))

    # one sharded train step on the global batch, each process
    # contributing its local half of the data
    images, masks = make_blobs(8, 32, 32, seed=0)
    model = UNet(base_channels=4, dropout=0.0)
    cfg = LossConfig(pde_weight=1e-4, phase_field_weight=1e-4,
                     diffusion_coeff=5.0, backend="jax")
    state = create_train_state(model, jax.random.key(0), 1e-3,
                               input_shape=(1, 32, 32, 1))
    barrier("b_shard_state")  # device_put runs a consistency allgather
    state = shard_train_state(state, mesh)
    step = make_sharded_train_step(model, cfg, mesh)
    sh = batch_sharding(mesh)
    lo, hi = pid * 4, (pid + 1) * 4
    x = jax.make_array_from_process_local_data(sh, images[lo:hi],
                                               images.shape)
    y = jax.make_array_from_process_local_data(sh, masks[lo:hi],
                                               masks.shape)
    compiled = step.lower(state, x, y).compile()  # local, slow, skewed
    barrier("b_step")  # ... so sync again before executing collectives
    state, loss = compiled(state, x, y)
    leaves = jax.tree_util.tree_leaves(state.params)
    param_sum = float(sum(jnp.sum(jnp.abs(l)) for l in leaves))
    with open(out_path, "w") as f:
        json.dump({{"pid": pid, "psum_n": psum_n,
                    "loss": float(loss), "param_sum": param_sum}}, f)
    print(f"proc {{pid}} ok", flush=True)
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_two_process_distributed_matches_single_process(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=str(REPO)))
    port = _free_port()
    # scrubbed env: inherited JAX/XLA vars from the pytest process can
    # initialise the backend before jax.distributed.initialize runs
    env = {k: v for k, v in os.environ.items()
           if not (k.startswith(("JAX_", "XLA_", "TPU_", "LIBTPU"))
                   or k == "PJRT_DEVICE")}
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port),
             str(tmp_path / f"out{i}.json")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        assert p.returncode == 0, stdout[-4000:]
    for i in range(2):
        with open(tmp_path / f"out{i}.json") as f:
            outs.append(json.load(f))

    # both processes saw the same 8-device global program
    assert outs[0]["psum_n"] == outs[1]["psum_n"] == 8.0
    assert outs[0]["loss"] == pytest.approx(outs[1]["loss"], rel=1e-6)
    assert outs[0]["param_sum"] == pytest.approx(outs[1]["param_sum"],
                                                 rel=1e-6)

    # ... and it equals the single-process step on this 8-virtual-device
    # parent (the configuration every other test already validates)
    images, masks = make_blobs(8, 32, 32, seed=0)
    model = UNet(base_channels=4, dropout=0.0)
    cfg = LossConfig(pde_weight=1e-4, phase_field_weight=1e-4,
                     diffusion_coeff=5.0, backend="jax")
    state = create_train_state(model, jax.random.key(0), 1e-3,
                               input_shape=(1, 32, 32, 1))
    mesh = make_mesh(data=8, space=1)
    state = shard_train_state(state, mesh)
    step = make_sharded_train_step(model, cfg, mesh)
    x = jax.device_put(images, batch_sharding(mesh))
    y = jax.device_put(masks, batch_sharding(mesh))
    state, loss = step(state, x, y)
    leaves = jax.tree_util.tree_leaves(jax.device_get(state.params))
    param_sum = float(sum(np.sum(np.abs(l)) for l in leaves))

    assert outs[0]["loss"] == pytest.approx(float(loss), rel=1e-5)
    assert outs[0]["param_sum"] == pytest.approx(param_sum, rel=1e-5)
