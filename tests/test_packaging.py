"""Packaging sanity: pyproject metadata stays in sync with the package.

The reference ships only a requirements.txt (/root/reference/requirements.txt);
this framework is additionally pip-installable (library surface; the four
CLIs stay repo-root scripts mirroring the reference layout).
"""

import sys
import tomllib
from pathlib import Path

import physics_informed_image_segmentation_tpu as pkg
from physics_informed_image_segmentation_tpu.data import native_raster

REPO = Path(__file__).resolve().parent.parent


def _pyproject():
    with open(REPO / "pyproject.toml", "rb") as f:
        return tomllib.load(f)


def test_version_is_dynamic_from_package():
    doc = _pyproject()
    assert "version" in doc["project"]["dynamic"]
    attr = doc["tool"]["setuptools"]["dynamic"]["version"]["attr"]
    assert attr == "physics_informed_image_segmentation_tpu.__version__"
    assert pkg.__version__.count(".") == 2


def test_declared_dependencies_are_importable():
    # every runtime dependency must exist in this environment under its
    # canonical import name (torch/cv2 are test-only extras, not here)
    import_name = {
        "orbax-checkpoint": "orbax.checkpoint",
        "Pillow": "PIL",
    }
    doc = _pyproject()
    for dep in doc["project"]["dependencies"]:
        name = dep.split(">=")[0].split("==")[0].strip()
        __import__(import_name.get(name, name))


def test_framework_never_imports_torch_or_cv2_at_module_level():
    # torch/opencv are golden-oracle test dependencies only; the package
    # must not import them at module level (they are optional extras in
    # pyproject).  Function-local lazy imports are allowed: .pth interop
    # (utils/torch_interop.py::load_torch_checkpoint) needs torch only
    # when the user actually loads a reference checkpoint.
    hits = []
    for py in (REPO / "physics_informed_image_segmentation_tpu").rglob("*.py"):
        for i, line in enumerate(py.read_text().splitlines(), 1):
            if line.startswith(("import torch", "from torch", "import cv2",
                                "from cv2")):  # column 0 = module level
                hits.append(f"{py}:{i}")
    assert not hits, hits


def test_native_source_shipped_as_data_file():
    doc = _pyproject()
    files = doc["tool"]["setuptools"]["data-files"][
        "share/physics_informed_image_segmentation_tpu/native"]
    assert files == ["native/rasterize.cpp"]
    assert (REPO / "native" / "rasterize.cpp").exists()


def test_native_source_discovery_prefers_checkout():
    src = native_raster._find_source()
    assert src == REPO / "native" / "rasterize.cpp"
    # installed-layout candidates include the interpreter prefix share dir
    share = Path(sys.prefix) / "share" / \
        "physics_informed_image_segmentation_tpu" / "native" / "rasterize.cpp"
    # (not present in a checkout run — just assert the build-dir fallback
    # logic: an unwritable source dir diverts the build to the user cache)
    cache_build = native_raster._build_dir(share)
    assert not str(cache_build).startswith(str(share.parent)) or \
        share.parent.exists()
