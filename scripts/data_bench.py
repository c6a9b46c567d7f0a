"""Input-pipeline throughput (host side): decode rate and streaming feed rate.

The training path decodes each split ONCE (into HBM); the streaming
path (data/streaming.py) re-feeds per-batch from host RAM for datasets
that exceed HBM.  This measures both stages so "the input pipeline
keeps the TPU fed" is a number, not a claim:

    python scripts/data_bench.py

Runs on host CPU only (JAX_PLATFORMS=cpu) — the feed-rate figure is the
host production rate; the tunnelled-TPU H2D link of this dev setup is
not representative of a real host-attached chip.
"""

from __future__ import annotations

import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

os.environ["JAX_PLATFORMS"] = "cpu"

N = 200
BATCH = 8


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from physics_informed_image_segmentation_tpu.data import (
        CocoSegmentationSource,
        write_synthetic_coco,
    )
    from physics_informed_image_segmentation_tpu.data.streaming import (
        HostDataset,
        batch_iterator,
        prefetch_to_device,
    )

    root = Path("/tmp/data_bench")
    img_dir, ann = root / "images", root / "annotations.json"
    # regenerate when the cache is missing OR was written with a
    # different N (a stale cache must not crash the benchmark)
    if not (img_dir.exists() and ann.exists()
            and len(list(img_dir.glob("*.png"))) == N):
        shutil.rmtree(root, ignore_errors=True)
        img_dir, ann = write_synthetic_coco(root, n=N)

    for backend in ("pil", "native"):
        t0 = time.perf_counter()
        src = CocoSegmentationSource(img_dir, ann, raster_backend=backend)
        dt = time.perf_counter() - t0
        assert len(src) == N
        print(f"DATA decode backend={backend}: {N / dt:8.1f} img/s "
              f"(one-time per split)", flush=True)

    host = HostDataset(n=N, images=src.images, masks=src.masks)
    # warm
    for _ in prefetch_to_device(batch_iterator(host, BATCH, shuffle=True)):
        pass
    t0 = time.perf_counter()
    epochs = 20
    count = 0
    for e in range(epochs):
        for x, y, v in prefetch_to_device(
            batch_iterator(host, BATCH, shuffle=True, epoch=e)
        ):
            count += int(np.sum(np.asarray(v)))
    dt = time.perf_counter() - t0
    print(f"DATA streaming feed (batch={BATCH}, prefetch=2): "
          f"{count / dt:8.1f} img/s sustained", flush=True)


if __name__ == "__main__":
    main()
