import time, jax, jax.numpy as jnp
from physics_informed_image_segmentation_tpu.models import UNet
from physics_informed_image_segmentation_tpu.train import LossConfig, create_train_state, make_train_epoch_fn
from physics_informed_image_segmentation_tpu.data import make_blobs, DeviceDataset, epoch_batch_indices

images, masks = make_blobs(400, 128, 128, seed=0)
data = DeviceDataset.from_numpy(images, masks)
idx, valid = epoch_batch_indices(data.n, 8, shuffle=True, key=jax.random.key(1))
cfg = LossConfig(pde_weight=1e-4, phase_field_weight=1e-4, diffusion_coeff=5.0, backend="pallas")
for fast in (False, True):
    model = UNet(base_channels=64, dtype=jnp.bfloat16, fast_upsample=fast)
    fn = make_train_epoch_fn(model, cfg, compute_metrics=True)
    state = create_train_state(model, jax.random.key(0), 1e-4, input_shape=(1,128,128,1))
    state, r = fn(state, data.images, data.masks, idx, valid); float(r["loss"])
    t0 = time.perf_counter(); REPS=5
    for _ in range(REPS):
        state, r = fn(state, data.images, data.masks, idx, valid)
        lv = float(r["loss"])
    dt = (time.perf_counter()-t0)/REPS
    print(f"fast_upsample={fast}: {dt/len(idx)*1e3:.2f} ms/step, {data.n/dt:,.0f} img/s", flush=True)
