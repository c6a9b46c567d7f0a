"""Native C++ rasterizer vs the PIL reference path."""

import numpy as np
import pytest
from PIL import Image, ImageDraw

from physics_informed_image_segmentation_tpu.data.native_raster import (
    native_available,
    rasterize_batch_native,
    rasterize_native,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ unavailable or build failed"
)


def _pil_mask(annotations, H, W):
    img = Image.new("L", (W, H), 0)
    draw = ImageDraw.Draw(img)
    for ann in annotations:
        for poly in ann.get("segmentation", []):
            if len(poly) >= 6:
                pts = np.asarray(poly, np.float64).reshape(-1, 2)
                draw.polygon(pts.flatten().tolist(), outline=1, fill=1)
    return (np.array(img, np.float32) > 0).astype(np.float32)


def _circle(cy, cx, r, k=24):
    t = np.linspace(0, 2 * np.pi, k, endpoint=False)
    return np.stack([cx + r * np.cos(t), cy + r * np.sin(t)], 1).flatten().tolist()


def _random_scene(rng, H, W, n_cells):
    anns = []
    for _ in range(n_cells):
        cy = rng.uniform(0.1, 0.9) * H
        cx = rng.uniform(0.1, 0.9) * W
        r = rng.uniform(4, 0.2 * min(H, W))
        anns.append({"segmentation": [_circle(cy, cx, r)]})
    return anns


def _iou(a, b):
    inter = np.sum((a > 0) & (b > 0))
    union = np.sum((a > 0) | (b > 0))
    return inter / union if union else 1.0


class TestAgreementWithPIL:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_random_scenes_high_iou(self, seed):
        rng = np.random.default_rng(seed)
        H, W = 96, 112
        anns = _random_scene(rng, H, W, int(rng.integers(1, 5)))
        ours = rasterize_native(anns, (H, W))
        ref = _pil_mask(anns, H, W)
        # sub-pixel rounding differs from Pillow on a thin boundary ring;
        # interiors agree (see test_triangle_exact_interior)
        assert _iou(ours, ref) > 0.95

    def test_triangle_exact_interior(self):
        anns = [{"segmentation": [[10, 10, 50, 10, 30, 40]]}]
        ours = rasterize_native(anns, (64, 64))
        ref = _pil_mask(anns, 64, 64)
        # interiors agree; disagreement confined to a 1px boundary ring
        from physics_informed_image_segmentation_tpu.ops.metrics import (
            extract_boundaries_np,
        )

        ref_boundary = extract_boundaries_np(ref)
        disagreement = np.abs(ours - ref) > 0
        # every disagreeing pixel is within 1px of the reference boundary
        from scipy.ndimage import binary_dilation

        near_boundary = binary_dilation(ref_boundary > 0, iterations=1)
        assert disagreement[~near_boundary].sum() == 0

    def test_small_polygons_skipped(self):
        anns = [{"segmentation": [[0, 0, 10, 10]]}]  # 4 coords
        ours = rasterize_native(anns, (32, 32))
        assert ours.sum() == 0

    def test_out_of_bounds_polygons_clipped(self):
        anns = [{"segmentation": [_circle(0, 0, 20)]}]  # centered at corner
        ours = rasterize_native(anns, (32, 32))
        assert np.isfinite(ours).all()
        assert ours.sum() > 0


class TestBatch:
    def test_batch_matches_single(self):
        rng = np.random.default_rng(7)
        H, W = 64, 64
        scenes = [_random_scene(rng, H, W, 3) for _ in range(6)]
        batch = rasterize_batch_native(scenes, (H, W), n_threads=4)
        assert batch.shape == (6, H, W)
        for i, anns in enumerate(scenes):
            single = rasterize_native(anns, (H, W))
            np.testing.assert_array_equal(batch[i], single)

    def test_empty_batch(self):
        out = rasterize_batch_native([], (16, 16))
        assert out.shape == (0, 16, 16)


class TestCocoIntegration:
    def test_coco_source_native_backend(self, tmp_path):
        from physics_informed_image_segmentation_tpu.data import (
            CocoSegmentationSource,
            write_synthetic_coco,
        )

        image_dir, ann = write_synthetic_coco(tmp_path, n=4, seed=0)
        pil_src = CocoSegmentationSource(image_dir, ann, raster_backend="pil")
        nat_src = CocoSegmentationSource(image_dir, ann, raster_backend="native")
        assert pil_src.masks.shape == nat_src.masks.shape
        # after NEAREST downscale to 128x128 the two agree almost everywhere
        agree = (pil_src.masks == nat_src.masks).mean()
        assert agree > 0.995


class TestConcavePolygons:
    def _star(self, cy, cx, r_out, r_in, k=5):
        pts = []
        for i in range(2 * k):
            r = r_out if i % 2 == 0 else r_in
            t = np.pi * i / k
            pts += [cx + r * np.cos(t), cy + r * np.sin(t)]
        return pts

    def test_star_high_iou_with_pil(self):
        anns = [{"segmentation": [self._star(32, 32, 24, 10)]}]
        ours = rasterize_native(anns, (64, 64))
        ref = _pil_mask(anns, 64, 64)
        assert _iou(ours, ref) > 0.93  # concave: even-odd scanline agrees

    def test_overlapping_polygons_union(self):
        anns = [
            {"segmentation": [_circle(20, 20, 10)]},
            {"segmentation": [_circle(26, 26, 10)]},
        ]
        ours = rasterize_native(anns, (48, 48))
        ref = _pil_mask(anns, 48, 48)
        assert _iou(ours, ref) > 0.95

    def test_multi_part_segmentation_single_annotation(self):
        anns = [{"segmentation": [_circle(12, 12, 6), _circle(36, 36, 6)]}]
        ours = rasterize_native(anns, (48, 48))
        ref = _pil_mask(anns, 48, 48)
        assert _iou(ours, ref) > 0.95
