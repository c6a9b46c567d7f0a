"""CLI end-to-end smoke tests on an on-disk synthetic COCO dataset.

Exercises the full reference workflow surface: main.py (train),
run_ablation.py (study), evaluate.py (compare) — as subprocesses with
the real argument parsing, file layout, and artifact generation.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

from physics_informed_image_segmentation_tpu.data import write_synthetic_coco

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    """Reference directory layout with synthetic COCO splits."""
    root = tmp_path_factory.mktemp("cli_data")
    img = root / "images"
    ann = img / "annotation"
    ann.mkdir(parents=True)
    specs = {
        "training": 8,
        "validation": 4,
        "testing": 4,
        "in_dist_testing": 4,
        "out_dist_testing": 4,
    }
    for split, n in specs.items():
        image_dir, ann_path = write_synthetic_coco(
            root / f"_stage_{split}", n=n, height=64, width=64, seed=hash(split) % 1000
        )
        (img / split).mkdir(parents=True)
        for f in image_dir.iterdir():
            (img / split / f.name).write_bytes(f.read_bytes())
        (ann / f"{split}_annotation.json").write_text(ann_path.read_text())
    return root


def _run(args, cwd, timeout=1200, extra_env=None):
    env = dict(os.environ)
    if extra_env:
        env.update(extra_env)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    # force cpu through the config API too (the axon plugin overrides env)
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "import runpy, sys; sys.argv = sys.argv[1:]; "
        "runpy.run_path(sys.argv[0], run_name='__main__')"
    )
    return subprocess.run(
        [sys.executable, "-c", code, *args],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


@pytest.mark.slow
def test_main_cli_end_to_end(data_root):
    r = _run(
        [
            str(REPO / "main.py"),
            "--stage1-epochs", "2", "--stage2-epochs", "2",
            "--base-channels", "8",
            "--batch-size", "4", "--precision", "f32",
            "--physics-backend", "jax", "--seed", "0",
        ],
        cwd=data_root,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert (data_root / "models" / "unet_baseline.msgpack").exists()
    assert (data_root / "models" / "unet_pde_regularized.msgpack").exists()
    csvs = list((data_root / "output").glob("metrics_stage1_*.csv"))
    assert csvs
    assert list((data_root / "output").glob("test_metrics_stage2_*.json"))
    assert (data_root / "output" / "two_stage_comparison.png").exists()
    assert "TRAINING COMPLETE" in r.stdout


@pytest.mark.slow
def test_main_cli_resume_after_crash(data_root, tmp_path):
    """Crash mid-Stage-II (injected via PIIS_FAULT_AFTER), then
    `--resume` completes the run in the same dirs: Stage I is skipped
    via its final artifact, Stage II restarts from its latest Orbax
    checkpoint and continues the interrupted run's CSV in place."""
    import csv as _csv

    (tmp_path / "images").symlink_to(data_root / "images")
    args = [
        str(REPO / "main.py"),
        "--stage1-epochs", "2", "--stage2-epochs", "2",
        "--base-channels", "8",
        "--batch-size", "4", "--precision", "f32",
        "--physics-backend", "jax", "--seed", "0", "--no-plots",
        "--checkpoint-every", "1",
    ]
    r = _run(args, cwd=tmp_path, extra_env={"PIIS_FAULT_AFTER": "Stage II:1"})
    assert r.returncode != 0
    assert "PIIS_FAULT_AFTER" in r.stderr
    assert (tmp_path / "models" / "unet_baseline.msgpack").exists()
    assert not (tmp_path / "models" / "unet_pde_regularized.msgpack").exists()

    r = _run(args + ["--resume"], cwd=tmp_path)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "[resume] stage already complete" in r.stdout   # Stage I skipped
    assert "[resume] restored" in r.stdout                 # Stage II continued
    assert (tmp_path / "models" / "unet_pde_regularized.msgpack").exists()
    assert "TRAINING COMPLETE" in r.stdout

    # exactly one Stage-II CSV, continued in place with epochs 1..2
    csvs = list((tmp_path / "output").glob("metrics_stage2_*.csv"))
    assert len(csvs) == 1
    with open(csvs[0], newline="") as f:
        rows = list(_csv.DictReader(f))
    assert [int(row["epoch"]) for row in rows] == [1, 2]


@pytest.mark.slow
def test_evaluate_cli(data_root):
    # depends on artifacts from the main CLI test
    baseline = data_root / "models" / "unet_baseline.msgpack"
    pde = data_root / "models" / "unet_pde_regularized.msgpack"
    if not baseline.exists():
        pytest.skip("main CLI test did not run first")
    r = _run(
        [
            str(REPO / "evaluate.py"),
            "--baseline", str(baseline), "--pde", str(pde),
            "--base-channels", "8",
        ],
        cwd=data_root,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "EVALUATION COMPLETE" in r.stdout
    assert list((data_root / "output").glob("statistical_comparison_*.json"))


@pytest.mark.slow
def test_evaluate_cli_single_model(data_root):
    """--model-path: single-checkpoint evaluation — the usage the
    reference README documents (/root/reference/README.md:162-165) but
    its CLI never implemented."""
    pde = data_root / "models" / "unet_pde_regularized.msgpack"
    if not pde.exists():
        pytest.skip("main CLI test did not run first")
    r = _run(
        [
            str(REPO / "evaluate.py"),
            "--model-path", str(pde),
            "--base-channels", "8",
        ],
        cwd=data_root,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "EVALUATION COMPLETE" in r.stdout
    out = data_root / "output" / f"single_model_metrics_{pde.stem}.json"
    assert out.exists()
    payload = json.loads(out.read_text())
    assert set(payload) >= {"dice_scores", "iou_scores",
                            "boundary_f1_scores", "hausdorff_distances"}
    stats = payload["dice_scores"]["statistics"]
    assert stats["count"] == len(payload["dice_scores"]["per_image"]) > 0

    # mutually exclusive flags are rejected
    r2 = _run(
        [str(REPO / "evaluate.py"), "--model-path", str(pde),
         "--baseline", str(pde)],
        cwd=data_root,
    )
    assert r2.returncode != 0


@pytest.mark.slow
def test_run_ablation_cli(data_root):
    r = _run(
        [
            str(REPO / "run_ablation.py"),
            "--ablation", "R1",
            "--base-channels", "8",
            "--stage1-epochs", "1", "--stage2-epochs", "1",
            "--batch-size", "4", "--precision", "f32",
            "--physics-backend", "jax",
        ],
        cwd=data_root,
        timeout=2400,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    folders = list((data_root / "output" / "ablation").glob("R1_*"))
    assert folders
    results = list(folders[0].glob("ablation_R1_*.json"))
    assert results
    data = json.loads(results[0].read_text())
    assert len(data["results"]) == 4  # R1.0-R1.3
    assert "ALL ABLATION STUDIES COMPLETE" in r.stdout


@pytest.mark.slow
def test_graft_entry_dryrun_multichip():
    """The driver's multichip dry-run contract: 8-device mesh train step."""
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, str(REPO / "__graft_entry__.py"), "8"],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "dryrun_multichip OK" in r.stdout


class TestFlagParity:
    """Every reference CLI flag must be accepted by our CLIs."""

    @pytest.mark.parametrize(
        "ours,theirs",
        [
            ("main.py", "/root/reference/main.py"),
            ("run_ablation.py", "/root/reference/run_ablation.py"),
            ("evaluate.py", "/root/reference/evaluate.py"),
        ],
    )
    def test_reference_flags_accepted(self, ours, theirs):
        import re

        ref_flags = set(re.findall(r'"(--[a-z\-]+)"', Path(theirs).read_text())) | set(
            re.findall(r"'(--[a-z\-]+)'", Path(theirs).read_text())
        )
        assert ref_flags, f"no flags parsed from {theirs}"
        env = dict(os.environ)
        env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
        r = subprocess.run(
            [sys.executable, str(REPO / ours), "--help"],
            capture_output=True, text=True, timeout=300, env=env, cwd=REPO,
        )
        assert r.returncode == 0, r.stderr
        missing = [f for f in ref_flags if f not in r.stdout]
        assert not missing, f"{ours} missing reference flags: {missing}"
