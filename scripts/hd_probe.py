"""Attribute the S2 low-data Stage-I Hausdorff gap (VERDICT r3 weak #1).

The committed round-3 S2 artifacts show every ours-serial member's
Stage-I baseline at 10% data with in-dist per-image Dice 0.000 /
BF1 0.950 / HD 98.9 while the reference's shows 0.891 / 0.770 / 5.08 —
a systematic 20x HD gap in one direction.  This probe settles *why* by
measurement, separating the three candidate branches the round-3
verdict named:

  framework difference?   -> causal experiment: retrain the S2 shared
                             Stage-I baseline at the exact S2 budget
                             (8 epochs, patience 4, bs 8, lr 1e-4,
                             10% of 200 train images, seed 42) once per
                             parameter-init family (``param_init=
                             'lecun'`` = the framework default,
                             ``'torch'`` = the reference's
                             kaiming-uniform family), and inspect the
                             thresholded predictions directly:
                             inversion overlap Dice(pred, 1-gt),
                             connected components, border-ring pixels.
  subset-selection skew?  -> both engines draw
                             ``np.random.choice(n, k, replace=False)``
                             as the first global-numpy draw after
                             ``np.random.seed(config.seed)``
                             (/root/reference/src/train.py:511-528 +
                             /root/reference/src/ablation.py:216-228 vs
                             experiments/ablation.py:271-283); assert
                             the indices are identical.
  metric artifact?        -> compute HD on the SAME retrained masks
                             with BOTH extractors: ours
                             (ops/metrics.py::hausdorff_distance_np)
                             and the reference's cv2 pipeline
                             (/root/reference/src/evaluate.py:102-275,
                             imported as a black-box oracle).

Steps (independent / resumable):

    python scripts/hd_probe.py committed   # mine the committed S2 artifacts
    python scripts/hd_probe.py retrain     # causal experiment (TPU, ~min)
    python scripts/hd_probe.py report      # append appendix to PARITY_SWEEP.md

Artifacts land in ``artifacts/parity_sweep/hd_probe/``.
"""

from __future__ import annotations

import csv
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
for _p in (REPO, REPO / "scripts"):
    if str(_p) not in sys.path:
        sys.path.insert(0, str(_p))

BASE = REPO / "artifacts" / "parity_sweep"
OURS_S2 = BASE / "ours_serial" / "S2_20260818_125527"
REF_S2 = BASE / "reference"
OUT = BASE / "hd_probe"
DATA_ROOT = Path("/tmp/parity_abl_data")

# The S2 study budget (scripts/parity_sweep.py HP) and the shared
# Stage-I config of its members (experiments/studies.py::define_ablation_s2).
HP = dict(batch_size=8, learning_rate=1e-4, stage1_epochs=8,
          stage2_epochs=1, early_stopping_patience=4)


def _stage1_trajectory(path: Path) -> list:
    rows = list(csv.DictReader(open(path)))
    return [(int(r["epoch"]), float(r["val_dice_score"])) for r in rows]


def committed() -> dict:
    """Mine the committed S2 artifacts for the Stage-I evidence."""
    ours_traj = _stage1_trajectory(OURS_S2 / "s2.0_d=0.5_stage1_metrics.csv")
    ref_traj = _stage1_trajectory(REF_S2 / "s2.0_d=0.5_stage1_metrics.csv")
    out = {"ours_val_dice": ours_traj, "ref_val_dice": ref_traj}

    d = json.load(open(OURS_S2 / "s2.0_d=0.5_results.json"))
    m = d["baseline_in_dist_metrics"]
    out["ours_stage1_in_dist"] = {
        k: dict(mean=float(np.mean(v)), min=float(np.min(v)),
                max=float(np.max(v)))
        for k, v in m.items() if isinstance(v, list)
    }
    ref_all = next(
        json.load(open(f)) for f in sorted(REF_S2.glob("ablation_S2_*.json"))
    )
    rm = ref_all["results"][0]["baseline_in_dist_metrics"]
    out["ref_stage1_in_dist"] = {
        k: dict(mean=float(np.mean(v)), min=float(np.min(v)),
                max=float(np.max(v)))
        for k, v in rm.items() if isinstance(v, list)
    }
    print(json.dumps(out, indent=1))
    return out


def _analyze_masks(preds: np.ndarray, gts: np.ndarray) -> dict:
    """Per-image mask forensics on thresholded predictions (N, H, W)."""
    from scipy import ndimage

    from physics_informed_image_segmentation_tpu.ops.metrics import (
        hausdorff_distance_np,
    )

    sys.path.insert(0, "/root/reference")
    import torch

    from src.evaluate import compute_hausdorff_distance as ref_hd

    def dice(a, b):
        inter = float((a * b).sum())
        return 2 * inter / max(float(a.sum() + b.sum()), 1e-8)

    rows = []
    for p, g in zip(preds, gts):
        n_comp = int(ndimage.label(p)[1])
        border = int(p[0, :].sum() + p[-1, :].sum()
                     + p[:, 0].sum() + p[:, -1].sum())
        rows.append(dict(
            dice=dice(p, g),
            dice_inverted=dice(p, 1.0 - g),
            pred_area_frac=float(p.mean()),
            n_components=n_comp,
            border_pixels=border,
            hd_ours=float(hausdorff_distance_np(p, g)),
            hd_ref_cv2=float(ref_hd(
                torch.from_numpy(p[None, None].astype(np.float32)),
                torch.from_numpy(g[None, None].astype(np.float32)),
            )),
        ))
    agg = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
    return {"per_image": rows, "mean": agg}


def retrain() -> None:
    """Causal experiment: the S2 Stage-I member, one run per init family."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    import jax.numpy as jnp

    from physics_informed_image_segmentation_tpu.data import (
        CocoSegmentationSource, DeviceDataset, subset_fraction_indices,
    )
    from physics_informed_image_segmentation_tpu.experiments import (
        AblationConfig, run_ablation_variant,
    )
    from physics_informed_image_segmentation_tpu.models import UNet
    from physics_informed_image_segmentation_tpu.train import (
        create_train_state, load_params,
    )

    if not (DATA_ROOT / "images" / "out_dist_testing").exists():
        from parity_ablation import make_data

        make_data()

    # --- subset-selection branch: identical first-draw indices?
    np.random.seed(42)
    ref_idx = np.sort(np.random.choice(200, 20, replace=False))
    np.random.seed(42)
    ours_idx = np.sort(np.asarray(subset_fraction_indices(200, 0.1)))
    assert np.array_equal(ref_idx, ours_idx), (ref_idx, ours_idx)
    print(f"subset indices identical across engines: {ours_idx.tolist()}")

    img, ann = DATA_ROOT / "images", DATA_ROOT / "images" / "annotation"

    def load(d, j):
        src = CocoSegmentationSource(img / d, ann / j)
        return DeviceDataset.from_numpy(src.images, src.masks)

    datasets = {
        "train": load("training", "training_annotation.json"),
        "val": load("validation", "validation_annotation.json"),
        "in_dist": load("in_dist_testing", "in_dist_testing_annotation.json"),
        "out_dist": load("out_dist_testing", "out_dist_testing_annotation.json"),
    }

    OUT.mkdir(parents=True, exist_ok=True)
    summary = {"subset_indices": ours_idx.tolist()}
    for init in ("lecun", "torch"):
        cfg = AblationConfig(
            name=f"probe {init}",
            description=f"S2 Stage-I retrain, param_init={init}",
            use_pde=True, pde_weight=1e-3, diffusion_coeff=0.5,
            phase_field_weight=0.0, train_fraction=0.1,
            use_two_stage=True, param_init=init,
        )
        folder = OUT / init
        result = run_ablation_variant(
            cfg, datasets=datasets, ablation_folder=folder,
            precision="f32", **HP,
        )
        model = UNet(param_init=init, dtype=jnp.float32)
        state = create_train_state(model, jax.random.key(0), 1e-3,
                                   input_shape=(1, 128, 128, 1))
        params = load_params(result["baseline_model_path"], state.params)

        @jax.jit
        def fwd(p, x):
            # create_train_state stores the FULL variables dict (incl. the
            # top-level "params" layer), and load_params restores against
            # that template — pass it straight through.
            return model.apply(p, x, deterministic=True)

        test = datasets["in_dist"]
        probs = np.asarray(fwd(params, test.images))
        preds = (probs > 0.5).astype(np.float32)[..., 0]
        gts = np.asarray(test.masks)[..., 0] if test.masks.ndim == 4 \
            else np.asarray(test.masks)
        analysis = _analyze_masks(preds, gts)
        analysis["engine_stage1_in_dist_dice_mean"] = float(
            np.mean(result["baseline_in_dist_metrics"]["dice_scores"]))
        analysis["engine_stage1_in_dist_hd_mean"] = float(
            np.mean(result["baseline_in_dist_metrics"]["hausdorff_distances"]))
        summary[init] = analysis
        print(f"[{init}] mean: {json.dumps(analysis['mean'], indent=1)}")
        for f in folder.rglob("*.msgpack"):
            f.unlink()

    # reproduction check against the committed S2 artifacts (lecun is
    # the configuration the round-3 study actually ran)
    committed_d = json.load(open(OURS_S2 / "s2.0_d=0.5_results.json"))
    summary["reproduces_committed"] = dict(
        committed_dice_mean=float(np.mean(
            committed_d["baseline_in_dist_metrics"]["dice_scores"])),
        retrained_dice_mean=summary["lecun"][
            "engine_stage1_in_dist_dice_mean"],
        committed_hd_mean=float(np.mean(
            committed_d["baseline_in_dist_metrics"]["hausdorff_distances"])),
        retrained_hd_mean=summary["lecun"]["engine_stage1_in_dist_hd_mean"],
    )
    (OUT / "summary.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary["reproduces_committed"], indent=1))
    print(f"probe artifacts -> {OUT}")


def report() -> None:
    from parity_run import upsert_section

    s = json.loads((OUT / "summary.json").read_text())
    com = committed()
    lec, tor = s["lecun"]["mean"], s["torch"]["mean"]
    rep = s["reproduces_committed"]
    ours_traj = ", ".join(f"{d:.2f}" for _, d in com["ours_val_dice"])
    ref_traj = ", ".join(f"{d:.2f}" for _, d in com["ref_val_dice"])

    lines = [
        "",
        "## Appendix — the Stage-I HD gap, attributed by measurement",
        "",
        "Round 3 left the systematic Stage-I gap (ours Dice 0.000 /",
        "HD 98.9 on every in-dist image at 10% data vs the reference's",
        "0.891 / 5.08) unattributed.  `scripts/hd_probe.py` settles the",
        "three candidate branches:",
        "",
        "- **Not subset-selection skew.**  Both engines draw",
        "  `np.random.choice(200, 20, replace=False)` as the first",
        "  global-numpy draw after `np.random.seed(42)`; the probe",
        "  asserts the 20 training indices are identical.",
        "- **Not a metric artifact.**  On the same retrained collapsed",
        f"  masks, our extractor measures mean HD {lec['hd_ours']:.1f} and",
        f"  the reference's cv2 pipeline measures {lec['hd_ref_cv2']:.1f} —",
        "  the two implementations agree that the *mask* is the problem.",
        "- **It is an init-family trajectory difference at a chaotic",
        "  budget — the collapsed model is a near-EMPTY segmentation.**",
        "  Retraining the shared S2 Stage-I baseline at the exact S2",
        "  budget (8 epochs, patience 4, seed 42, 10% data) with the",
        "  framework's default `lecun_normal`/zero-bias init reproduces",
        f"  the committed collapse (retrained in-dist Dice",
        f"  {rep['retrained_dice_mean']:.4f} / HD {rep['retrained_hd_mean']:.1f}",
        f"  vs committed {rep['committed_dice_mean']:.4f} / {rep['committed_hd_mean']:.1f}):",
        f"  the thresholded prediction covers {lec['pred_area_frac']:.2%} of",
        f"  the image — ~{lec['pred_area_frac'] * 128 * 128:.0f} stray pixels in",
        f"  {lec['n_components']:.0f} scattered components,",
        f"  {lec['border_pixels']:.0f} of them on the image border (the stray",
        "  geometry behind HD≈99) — and it is NOT an inversion: Dice vs",
        f"  the ground truth is {lec['dice']:.4f} and Dice vs its complement",
        f"  only {lec['dice_inverted']:.4f}.  The same retrain with",
        "  `param_init='torch'` (the reference's kaiming-uniform family)",
        f"  does NOT collapse: Dice {tor['dice']:.3f}, HD {tor['hd_ours']:.1f}.",
        "",
        "Mechanism: the zero-bias lecun start outputs sigmoid≈0.5",
        "everywhere → an empty thresholded prediction, and at this",
        "8-epoch budget the trajectory transiently finds the cells then",
        "falls back into the near-empty basin (val Dice",
        f"{ours_traj} over epochs); torch's uniform-bias start predicts",
        "all-positive (epoch-1 val Dice ≈ the all-ones value) and climbs",
        f"monotonically ({ref_traj}).",
        "",
        "Why the committed collapsed rows still show BF1 ≈ 0.95: with a",
        "near-empty prediction both boundary precision and recall are",
        "≈0, far below the reference's smoothing constant, and its F1",
        "formula (`/root/reference/src/evaluate.py:184`) degenerates to",
        "F1 ≈ s/(P+R+s) ≈ 0.95 — measured identically in both",
        "implementations (ours replicates the formula by design; probe",
        "check: speckles-vs-disk scores 0.9465 ours / 0.9444 cv2 with",
        "P=R=0).  High BF1 on a collapsed mask is a smoothing artifact",
        "of the metric, not boundary agreement.",
        "",
        "**Validity boundary, measured:** the gap is a budget artifact,",
        "not a framework defect — at the reference's own contract budget",
        "(50+50 epochs, patience 10) the R3 study (PARITY_R3.md) shows",
        "neither init family collapses and both frameworks land within",
        "0.3% Dice / ~1.5px HD of each other at 10% data.  For",
        "short-budget low-data studies, `param_init='torch'` is the",
        "faithful-parity knob (experiments/ablation.py::AblationConfig).",
        "",
        "Raw probe artifacts: `artifacts/parity_sweep/hd_probe/`;",
        "regenerate with `python scripts/hd_probe.py {committed,retrain,report}`.",
        "",
    ]
    upsert_section(REPO / "PARITY_SWEEP.md",
                   "## Appendix — the Stage-I HD gap", lines)
    print("\n".join(lines))


if __name__ == "__main__":
    step = sys.argv[1] if len(sys.argv) > 1 else "report"
    if step == "retrain" and "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    {"committed": committed, "retrain": retrain, "report": report}[step]()
