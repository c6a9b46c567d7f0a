"""Unit tests for the parity-experiment report generators in scripts/.

These scripts drive hours-long black-box runs against the actual
reference; the report/section assembly logic is the part that must not
crash or corrupt PARITY_*.md at the END of such a run, so it is pinned
here on synthetic artifacts.
"""

import importlib
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO / "scripts") not in sys.path:
    sys.path.insert(0, str(REPO / "scripts"))

pa = importlib.import_module("parity_ablation")
ps = importlib.import_module("parity_sweep")

# the two cells the bootstrap analysis called decisive-but-opposite
_FLIP_CELL = ("stage1_vs_stage2", "in_dist", "hausdorff_distances")


def _write_study(dirpath: Path, study: str, flip_cells=(), flip=False) -> None:
    """Minimal study JSON: one R1.3 result with a full verdict grid.

    Cells in ``flip_cells`` get ``significant=flip``; all others True.
    """
    sc = {}
    for pair in pa._PAIR_ARRAYS:
        sc[pair] = {}
        for dist in ("in_dist", "out_dist"):
            sc[pair][dist] = {
                m: {
                    "t_pvalue": 0.5,
                    "wilcoxon_pvalue": 0.5,
                    "significant": (
                        flip if (pair, dist, m) in flip_cells else True
                    ),
                }
                for m in pa._METRICS
            }
    doc = {
        "results": [
            {"config": {"name": pa.R13_NAME}, "stage_comparison": sc}
        ]
    }
    dirpath.mkdir(parents=True, exist_ok=True)
    path = dirpath / f"ablation_{study}_20260101_000000.json"
    path.write_text(json.dumps(doc))


def _scaffold(tmp_path, monkeypatch, *, extra_seeds=(123,), ref_flip_seed=None):
    """Fake main-study + seed-noise artifacts under tmp dirs."""
    art = tmp_path / "parity_ablation"
    seed_art = art / "seednoise"
    monkeypatch.setattr(pa, "ART", art)
    monkeypatch.setattr(pa, "SEED_ART", seed_art)
    _write_study(art / "reference", "R1")
    _write_study(art / "ours", "R1")
    for seed in extra_seeds:
        for side in ("reference", "ours"):
            flips = (
                (_FLIP_CELL,)
                if (side == "reference" and seed == ref_flip_seed)
                else ()
            )
            _write_study(
                seed_art / side, f"R1S{seed}", flip_cells=flips, flip=False
            )
    return art, seed_art


class TestSeednoiseSection:
    def test_incomplete_artifacts_return_none(self, tmp_path, monkeypatch):
        art = tmp_path / "parity_ablation"
        monkeypatch.setattr(pa, "ART", art)
        monkeypatch.setattr(pa, "SEED_ART", art / "seednoise")
        # no artifacts at all
        assert pa._seednoise_section() is None
        # base studies only (one seed per side) is still not enough
        _write_study(art / "reference", "R1")
        _write_study(art / "ours", "R1")
        assert pa._seednoise_section() is None

    def test_no_flips_counts_zero(self, tmp_path, monkeypatch):
        _scaffold(tmp_path, monkeypatch)
        text = "\n".join(pa._seednoise_section())
        assert "**0/24** cells" in text
        # all same-seed verdicts agree across frameworks
        assert "s42: 24/24" in text and "s123: 24/24" in text
        # stable decisive-opposite cells fall back to the bootstrap claim
        assert "stable across the seeds tried" in text
        # primary endpoint: all-SIG scaffold -> unanimous on both sides
        assert "reference **8/8** SIG" in text
        assert "ours **8/8** SIG" in text
        assert "no engine is implicated" in text

    def test_primary_endpoint_flip_in_reference_is_called_noise(
        self, tmp_path, monkeypatch
    ):
        pe_cell = ("stage1_vs_stage2", "in_dist", "dice_scores")
        _scaffold(tmp_path, monkeypatch, ref_flip_seed=123)
        # flip a PRIMARY cell in the reference at seed 123 only
        art = tmp_path / "parity_ablation"
        _write_study(
            art / "seednoise" / "reference",
            "R1S123",
            flip_cells=(pe_cell,),
            flip=False,
        )
        text = "\n".join(pa._seednoise_section())
        assert "reference **7/8** SIG" in text
        assert "ours **8/8** SIG" in text
        assert "WITHIN the reference across its own seeds" in text

    def test_primary_endpoint_flip_in_ours_is_flagged(
        self, tmp_path, monkeypatch
    ):
        pe_cell = ("stage1_vs_stage2", "out_dist", "iou_scores")
        _scaffold(tmp_path, monkeypatch)
        art = tmp_path / "parity_ablation"
        _write_study(
            art / "seednoise" / "ours",
            "R1S123",
            flip_cells=(pe_cell,),
            flip=False,
        )
        text = "\n".join(pa._seednoise_section())
        assert "ours **7/8** SIG" in text
        assert "COULD implicate the engine" in text

    def test_within_framework_flip_is_detected(self, tmp_path, monkeypatch):
        _scaffold(tmp_path, monkeypatch, ref_flip_seed=123)
        text = "\n".join(pa._seednoise_section())
        # the reference disagrees with itself on exactly the flipped cell
        assert "ITSELF across its own seeds on **1/24** cells" in text
        assert "flips across seeds within a single framework" in text
        # the cross-framework agreement drops only at the flipped seed
        assert "s42: 24/24" in text and "s123: 23/24" in text

    def test_provenance_notes_rendered(self, tmp_path, monkeypatch):
        _, seed_art = _scaffold(tmp_path, monkeypatch)
        seed_art.mkdir(parents=True, exist_ok=True)
        (seed_art / "provenance.json").write_text(
            json.dumps({"ours": "seed 123 on cpu (f32)"})
        )
        text = "\n".join(pa._seednoise_section())
        assert "ours: seed 123 on cpu (f32)" in text


class TestSeednoiseReportInsertion:
    ANCHOR = "## Artifact-structure agreement"
    DOC = (
        "# PARITY_ABLATION\n\nintro\n\n"
        "## Verdicts\n\ntable\n\n"
        f"{ANCHOR}\n\ntail stays intact\n"
    )

    def _report_file(self, tmp_path, monkeypatch):
        repo = tmp_path / "repo"
        repo.mkdir()
        (repo / "PARITY_ABLATION.md").write_text(self.DOC)
        monkeypatch.setattr(pa, "REPO", repo)
        return repo / "PARITY_ABLATION.md"

    def test_insert_and_idempotent_rerun(self, tmp_path, monkeypatch, capsys):
        _scaffold(tmp_path, monkeypatch)
        md = self._report_file(tmp_path, monkeypatch)
        pa.seednoise_report()
        first = md.read_text()
        assert pa._SEEDNOISE_HEADER in first
        # inserted BEFORE the anchor, which survives with its tail
        assert first.index(pa._SEEDNOISE_HEADER) < first.index(self.ANCHOR)
        assert "tail stays intact" in first
        # re-running replaces the section instead of duplicating it
        pa.seednoise_report()
        second = md.read_text()
        assert second.count(pa._SEEDNOISE_HEADER) == 1
        assert second.count(self.ANCHOR) == 1

    def test_incomplete_artifacts_leave_file_untouched(
        self, tmp_path, monkeypatch
    ):
        art = tmp_path / "parity_ablation"
        monkeypatch.setattr(pa, "ART", art)
        monkeypatch.setattr(pa, "SEED_ART", art / "seednoise")
        md = self._report_file(tmp_path, monkeypatch)
        pa.seednoise_report()
        assert md.read_text() == self.DOC

class TestSeednoiseSalvageResume:
    """Crash-recovery for the hours-long reference seed runs: `salvage`
    persists an interrupted run's stage artifacts into the repo, and
    `reference-resume` restarts from them, retraining only lost stages."""

    def _scaffold(self, tmp_path, monkeypatch):
        seed_art = tmp_path / "seednoise"
        ref_run = tmp_path / "refseednoise"
        data_root = tmp_path / "data"
        (data_root / "images").mkdir(parents=True)
        monkeypatch.setattr(pa, "SEED_ART", seed_art)
        monkeypatch.setattr(pa, "REF_SEED_RUN", ref_run)
        monkeypatch.setattr(pa, "DATA_ROOT", data_root)
        return seed_art, ref_run

    def _interrupted_run(self, ref_run, seed, ts="20260101_000000"):
        d = ref_run / "output" / "ablation" / f"R1S{seed}_{ts}"
        d.mkdir(parents=True)
        (d / "r1.3_rd_+_phase-field_stage1_metrics.csv").write_text("epoch\n1\n")
        (d / "r1.3_rd_+_phase-field_baseline_after_stage1.pth").write_bytes(b"w")
        (d / "irrelevant.log").write_text("x")
        return d

    def test_salvage_copies_only_incomplete_seed_stage_files(
        self, tmp_path, monkeypatch, capsys
    ):
        seed_art, ref_run = self._scaffold(tmp_path, monkeypatch)
        self._interrupted_run(ref_run, 123)
        # seed 777 completed normally: its full artifacts are collected
        done = ref_run / "output" / "ablation" / "R1S777_20260101_000001"
        done.mkdir(parents=True)
        (done / "x.csv").write_text("epoch\n")
        _write_study(seed_art / "reference" / "R1S777_20260101_000001", "R1S777")
        pa.run_seednoise_salvage()
        saved = sorted(
            p.name for p in (seed_art / "_interrupted").rglob("*") if p.is_file()
        )
        assert saved == [
            "r1.3_rd_+_phase-field_baseline_after_stage1.pth",
            "r1.3_rd_+_phase-field_stage1_metrics.csv",
        ]
        assert not list((seed_art / "_interrupted").glob("R1S777_*"))

    def test_resume_skips_done_and_missing_seeds(
        self, tmp_path, monkeypatch, capsys
    ):
        seed_art, _ = self._scaffold(tmp_path, monkeypatch)
        _write_study(seed_art / "reference" / "R1S123_20260101_000000", "R1S123")
        calls = []
        monkeypatch.setattr(pa.subprocess, "run", lambda *a, **k: calls.append(a))
        pa.run_seednoise_reference_resume()
        out = capsys.readouterr().out
        assert "seed 123: reference artifacts already present" in out
        assert "seed 777: no interrupted run found" in out
        assert calls == []

    def test_resume_parks_live_run_and_collects_artifacts(
        self, tmp_path, monkeypatch, capsys
    ):
        seed_art, ref_run = self._scaffold(tmp_path, monkeypatch)
        (ref_run / "src").mkdir(parents=True)  # working copy "exists"
        live = self._interrupted_run(ref_run, 123)
        # a stale salvage of the same seed must LOSE to the live copy
        stale = seed_art / "_interrupted" / "R1S123_20250101_000000"
        stale.mkdir(parents=True)
        envs = {}

        def fake_run(cmd, cwd=None, env=None, check=None):
            envs["resume_from"] = env["PARITY_RESUME_FROM"]
            d = ref_run / "output" / "ablation" / "R1S123_20260102_000000"
            d.mkdir(parents=True)
            (d / "ablation_R1S123_20260102_000000.json").write_text("{}")
            (d / "r1.3_rd_+_phase-field_stage1_metrics.csv").write_text("e\n")
            (d / "weights.pth").write_bytes(b"w")

        monkeypatch.setattr(pa.subprocess, "run", fake_run)
        pa.run_seednoise_reference_resume()
        # live interrupted dir was parked out of output/ and used as source
        assert envs["resume_from"] == str(ref_run / "_interrupted" / live.name)
        assert not live.exists()
        # driver was written with the seed baked in
        driver = (ref_run / "_seednoise_resume_driver.py").read_text()
        assert "R1S123" in driver and "v.seed = 123" in driver
        # fresh run's JSON/CSV collected into the artifact tree, pth not
        got = sorted(
            p.name
            for p in (seed_art / "reference").rglob("*")
            if p.is_file()
        )
        assert got == [
            "ablation_R1S123_20260102_000000.json",
            "r1.3_rd_+_phase-field_stage1_metrics.csv",
        ]


# ---------------------------------------------------------------- sweep

_SWEEP_VARIANTS = ["S2.0 D=0.5", "S2.4 D=10"]
_CSV_HEADER = "epoch,val_dice_score,train_loss\n"


def _sweep_study(dirpath: Path, *, timestamp: str = "20260101_000000") -> Path:
    """Minimal S2 study JSON + per-variant stage CSVs."""
    run = dirpath / f"S2_{timestamp}"
    run.mkdir(parents=True, exist_ok=True)
    sc_cell = {"t_pvalue": 0.01, "wilcoxon_pvalue": 0.01, "significant": True}
    doc = {
        "variants": [{"name": v} for v in _SWEEP_VARIANTS],
        "results": [
            {
                "config": {"name": v},
                "stage_comparison": {
                    d: {m: dict(sc_cell) for m in pa._METRICS}
                    for d in ("in_dist", "out_dist")
                },
            }
            for v in _SWEEP_VARIANTS
        ],
    }
    for key in ("aggregated_results_in_dist", "aggregated_results_out_dist"):
        doc[key] = {
            v: {m: {"mean": 0.9} for m in pa._METRICS} for v in _SWEEP_VARIANTS
        }
    (run / f"ablation_S2_{timestamp}.json").write_text(json.dumps(doc))
    for v in _SWEEP_VARIANTS:
        stem = v.lower().replace(" ", "_")
        for stage in ("stage1", "stage2"):
            (run / f"{stem}_{stage}_metrics.csv").write_text(
                _CSV_HEADER + "1,0.5,0.7\n2,0.6,0.6\n"
            )
    (run / "shared_stage1_metrics.csv").write_text(
        _CSV_HEADER + "1,0.5,0.7\n2,0.6,0.6\n"
    )
    return run


class TestSweepReport:
    def _scaffold(self, tmp_path, monkeypatch):
        art = tmp_path / "parity_sweep"
        monkeypatch.setattr(ps, "ART", art)
        repo = tmp_path / "repo"
        repo.mkdir()
        monkeypatch.setattr(ps, "REPO", repo)
        _sweep_study(art / "reference")
        _sweep_study(art / "ours_serial")
        _sweep_study(art / "ours_batched")
        # reference study files live flat (no S2_* run dir) in the real
        # tree, but _load_study rglobs, so the run-dir layout also works
        return art, repo / "PARITY_SWEEP.md"

    def test_report_without_probe(self, tmp_path, monkeypatch, capsys):
        _, md = self._scaffold(tmp_path, monkeypatch)
        ps.report()
        text = md.read_text()
        assert "## Agreement" in text
        assert "**16/16** significance verdicts agree" in text
        assert "Stage I is identical" in text
        assert "probe-precision" not in text  # no probe json yet

    def test_report_folds_probe_in(self, tmp_path, monkeypatch, capsys):
        art, md = self._scaffold(tmp_path, monkeypatch)
        probe = art / "precision_probe"
        probe.mkdir(parents=True)
        (probe / "summary.json").write_text(json.dumps({
            "platform": "tpu",
            "variant": "S2.4 D=10",
            "modes": {
                "default": {
                    "epoch1_abs_delta": 0.2,
                    "final_in_dist_dice_abs_delta": 0.5,
                },
                "highest": {
                    "epoch1_abs_delta": 1e-5,
                    "final_in_dist_dice_abs_delta": 1e-4,
                },
            },
        }))
        ps.report()
        text = md.read_text()
        assert "probe-precision" in text
        assert "shrinks the epoch-1 fork 20,000×" in text

    def test_report_partial_probe(self, tmp_path, monkeypatch, capsys):
        # 2 <= ratio < 100: precision shrinks the fork but doesn't close
        # it -> attributed to lowering-level numerics, precision one part
        art, md = self._scaffold(tmp_path, monkeypatch)
        probe = art / "precision_probe"
        probe.mkdir(parents=True)
        (probe / "summary.json").write_text(json.dumps({
            "platform": "tpu",
            "variant": "S2.4 D=10",
            "modes": {
                "default": {
                    "epoch1_abs_delta": 0.2,
                    "final_in_dist_dice_abs_delta": 0.5,
                },
                "highest": {
                    "epoch1_abs_delta": 0.04,
                    "final_in_dist_dice_abs_delta": 0.4,
                },
            },
        }))
        ps.report()
        text = md.read_text()
        assert "shrinks the epoch-1 fork 5.0× but does not close it" in text
        assert "precision is one measured component" in text

    def test_report_flags_unconfirmed_probe(self, tmp_path, monkeypatch, capsys):
        art, md = self._scaffold(tmp_path, monkeypatch)
        probe = art / "precision_probe"
        probe.mkdir(parents=True)
        (probe / "summary.json").write_text(json.dumps({
            "platform": "tpu",
            "variant": "S2.4 D=10",
            "modes": {
                "default": {
                    "epoch1_abs_delta": 0.2,
                    "final_in_dist_dice_abs_delta": 0.5,
                },
                "highest": {
                    "epoch1_abs_delta": 0.15,
                    "final_in_dist_dice_abs_delta": 0.4,
                },
            },
        }))
        ps.report()
        text = md.read_text()
        assert "does NOT confirm" in text
