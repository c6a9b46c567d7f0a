"""Multi-seed repeated-evaluations parity (VERDICT r2 item 4).

PARITY_RUN.md's round-2 verdict was a single seed riding the either-p
rule; this experiment trains N seeds through BOTH frameworks' two-stage
pipelines, then runs BOTH `run_repeated_evaluations` implementations
(/root/reference/src/evaluate_comparison.py:230-396 vs
`experiments.compare.run_repeated_evaluations`) on the pooled
checkpoints, and compares pooled statistics and significance verdicts.

Usage (steps independent / resumable):

    python scripts/parity_repeated.py data       # ensure the parity dataset
    python scripts/parity_repeated.py reference  # N reference trainings + pooled eval (slow, CPU)
    python scripts/parity_repeated.py ours       # N of ours + pooled eval
    python scripts/parity_repeated.py report     # append section to PARITY_RUN.md

The reference runs black-box from a /tmp copy: `main.py` per seed, then
a driver calling its own `run_repeated_evaluations` (the CLI writes no
JSON for the pooled comparison, so the driver serialises the returned
dict — API use only, nothing copied).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import textwrap
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
for _p in (REPO, REPO / "scripts"):
    if str(_p) not in sys.path:
        sys.path.insert(0, str(_p))

DATA_ROOT = Path("/tmp/parity_data")
REF_RUN = Path("/tmp/refrep")
ART = REPO / "artifacts" / "parity_repeated"

SEEDS = [42, 7, 123]
HP = dict(
    stage1_epochs=8,
    stage2_epochs=8,
    early_stopping_patience=5,
    batch_size=8,
    learning_rate=1e-4,
    pde_weight=1e-4,
    diffusion_coeff=5.0,
    reaction_threshold=0.5,
    phase_field_weight=1e-4,
    epsilon=0.05,
)

# --contract (VERDICT r3 item 4): the same multi-seed pooled protocol
# at the reference's CONTRACT budget — <=50+50 early-stopped epochs,
# patience 5 — on the 150/40/40 dataset of PARITY_RUN.md's tagged
# contract run, so the single-seed 4/4 verdict disagreement there is
# adjudicated by pooled data rather than by the stage-length argument.
CONTRACT = False


def _enable_contract() -> None:
    global DATA_ROOT, REF_RUN, ART, CONTRACT
    CONTRACT = True
    DATA_ROOT = Path("/tmp/parity_data_contract")
    REF_RUN = Path("/tmp/refrep_contract")
    ART = REPO / "artifacts" / "parity_repeated_contract"
    HP.update(stage1_epochs=50, stage2_epochs=50)


def make_data() -> None:
    """Reuse the matching parity_run dataset (seeded => bit-identical)."""
    if (DATA_ROOT / "images" / "testing").exists():
        print(f"dataset already at {DATA_ROOT}")
        return
    args = [sys.executable, str(REPO / "scripts" / "parity_run.py"), "data"]
    if CONTRACT:
        args += ["--tag", "contract", "--train-n", "150",
                 "--val-n", "40", "--test-n", "40"]
    subprocess.run(args, check=True)


REF_POOL_DRIVER = textwrap.dedent(
    """
    import json, sys, torch
    from pathlib import Path
    sys.path.insert(0, '.')
    from src.evaluate_comparison import run_repeated_evaluations, make_json_serializable

    seeds = {seeds}
    res = run_repeated_evaluations(
        baseline_model_paths=[Path(f'models/seed{{s}}_baseline.pth') for s in seeds],
        pde_model_paths=[Path(f'models/seed{{s}}_pde.pth') for s in seeds],
        test_dir=Path('images/testing'),
        test_json=Path('images/annotation/testing_annotation.json'),
        device=torch.device('cpu'),
        batch_size=8,
        output_dir=Path('output'),
    )
    with open('output/repeated_comparison.json', 'w') as f:
        json.dump(make_json_serializable(
            {{k: res[k] for k in ('baseline_metrics', 'pde_metrics',
                                  'comparison_results')}}), f, indent=2)
    """
).format(seeds=SEEDS)


def run_reference() -> None:
    # Per-seed resumable: a seed whose renamed checkpoint pair already
    # exists under models/ is skipped, so an interrupted run re-trains
    # only the seeds it lost.  The tree is only rebuilt on first entry.
    if not (REF_RUN / "main.py").exists():
        if REF_RUN.exists():
            shutil.rmtree(REF_RUN)
        shutil.copytree("/root/reference", REF_RUN)
    target = REF_RUN / "images"
    if target.exists() or target.is_symlink():
        if target.is_symlink():
            target.unlink()
        else:
            shutil.rmtree(target)
    target.symlink_to(DATA_ROOT / "images")
    env = dict(os.environ)
    env.update(OMP_NUM_THREADS="1", MKL_NUM_THREADS="1", PYTHONUNBUFFERED="1")
    models = REF_RUN / "models"

    # Cross-session salvage: completed per-seed checkpoint pairs are
    # mirrored into the (gitignored) artifacts tree, which lives on the
    # persistent repo disk — /tmp does not survive host restarts, and a
    # contract-budget reference seed costs ~4.5 h on this 1-vCPU host.
    salvage = ART / "reference" / "models"
    salvage.mkdir(parents=True, exist_ok=True)
    models.mkdir(parents=True, exist_ok=True)
    for f in salvage.glob("seed*.pth"):
        if not (models / f.name).exists():
            shutil.copy2(f, models / f.name)

    for seed in SEEDS:
        if (models / f"seed{seed}_baseline.pth").exists() and (
            models / f"seed{seed}_pde.pth"
        ).exists():
            print(f"reference train seed={seed}: already done, skipping",
                  flush=True)
            continue
        args = [
            sys.executable, "main.py",
            "--stage1-epochs", str(HP["stage1_epochs"]),
            "--stage2-epochs", str(HP["stage2_epochs"]),
            "--early-stopping-patience", str(HP["early_stopping_patience"]),
            "--batch-size", str(HP["batch_size"]),
            "--learning-rate", str(HP["learning_rate"]),
            "--pde-weight", str(HP["pde_weight"]),
            "--diffusion-coeff", str(HP["diffusion_coeff"]),
            "--reaction-threshold", str(HP["reaction_threshold"]),
            "--phase-field-weight", str(HP["phase_field_weight"]),
            "--epsilon", str(HP["epsilon"]),
            "--seed", str(seed),
        ]
        print(f"reference train seed={seed}:", " ".join(args), flush=True)
        subprocess.run(args, cwd=REF_RUN, env=env, check=True)
        shutil.move(models / "unet_baseline.pth", models / f"seed{seed}_baseline.pth")
        shutil.move(
            models / "unet_pde_regularized.pth", models / f"seed{seed}_pde.pth"
        )
        for name in (f"seed{seed}_baseline.pth", f"seed{seed}_pde.pth"):
            shutil.copy2(models / name, salvage / name)
        print(f"reference seed={seed} checkpoints salvaged -> {salvage}",
              flush=True)

    (REF_RUN / "_pool_driver.py").write_text(REF_POOL_DRIVER)
    subprocess.run(
        [sys.executable, "_pool_driver.py"], cwd=REF_RUN, env=env, check=True
    )

    out = ART / "reference"
    out.mkdir(parents=True, exist_ok=True)
    shutil.copy2(REF_RUN / "output" / "repeated_comparison.json", out)
    for f in (REF_RUN / "output").glob("aggregated_results_*.csv"):
        shutil.copy2(f, out / f.name)
    print(f"reference artifacts -> {out}")


def run_ours() -> None:
    from physics_informed_image_segmentation_tpu.experiments.compare import (
        run_repeated_evaluations,
    )
    from physics_informed_image_segmentation_tpu.train import train

    out = ART / "ours"
    out.mkdir(parents=True, exist_ok=True)
    pairs = []
    for seed in SEEDS:
        sdir = out / f"seed{seed}"
        b = sdir / "models" / "unet_baseline.msgpack"
        p = sdir / "models" / "unet_pde_regularized.msgpack"
        if not (b.exists() and p.exists()):
            train(
                use_two_stage=True,
                data_root=DATA_ROOT,
                output_dir=sdir / "output",
                models_dir=sdir / "models",
                make_plots=False,
                precision="f32",
                seed=seed,
                **HP,
            )
        pairs.append((b, p))

    res = run_repeated_evaluations(
        [b for b, _ in pairs],
        [p for _, p in pairs],
        DATA_ROOT / "images" / "testing",
        DATA_ROOT / "images" / "annotation" / "testing_annotation.json",
        output_dir=out,
        dtype="f32",
    )
    serializable = {
        "baseline_metrics": {k: [float(x) for x in v]
                             for k, v in res["baseline_metrics"].items()},
        "pde_metrics": {k: [float(x) for x in v]
                        for k, v in res["pde_metrics"].items()},
        "comparison_results": json.loads(json.dumps(
            res["comparison_results"], default=float)),
    }
    with open(out / "repeated_comparison.json", "w") as f:
        json.dump(serializable, f, indent=2)
    print(f"our artifacts -> {out}")


_METRICS = ["dice_scores", "iou_scores", "boundary_f1_scores", "hausdorff_distances"]
_NAMES = {"dice_scores": "Dice", "iou_scores": "IoU",
          "boundary_f1_scores": "Boundary-F1", "hausdorff_distances": "Hausdorff"}


def report() -> None:
    with open(ART / "reference" / "repeated_comparison.json") as f:
        ref = json.load(f)
    with open(ART / "ours" / "repeated_comparison.json") as f:
        ours = json.load(f)

    n_ref = len(ref["baseline_metrics"]["dice_scores"])
    n_ours = len(ours["baseline_metrics"]["dice_scores"])
    title = ("## Contract-budget multi-seed repeated evaluations"
             if CONTRACT else "## Multi-seed repeated evaluations")
    dataset_desc = ("same 150/40/40 contract dataset (the PARITY_RUN.md "
                    "tagged-contract dataset)" if CONTRACT
                    else "same 300-image dataset")
    lines = [
        "",
        f"{title} (pooled across "
        f"{len(SEEDS)} seeds: {SEEDS})",
        "",
        "Each framework trained the two-stage pipeline from scratch once per",
        "seed (" + ", ".join(f"{k}={v}" for k, v in HP.items()) + ") on the",
        f"{dataset_desc}, then ran its own `run_repeated_evaluations`",
        "(/root/reference/src/evaluate_comparison.py:230-396) pooling the",
        f"per-image test metrics across all runs ({n_ref} pooled ref values,",
        f"{n_ours} ours, per metric) before the paired tests — the pooling",
        "path the round-2 single-seed verdict lacked",
        "(`scripts/parity_repeated.py`).",
        "",
        "| metric | ref base | ours base | ref PDE | ours PDE | ref t-p | ours t-p | ref W-p | ours W-p | ref sig | ours sig |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for m in _METRICS:
        r = ref["comparison_results"][m]
        o = ours["comparison_results"][m]
        lines.append(
            f"| {_NAMES[m]} | {r['baseline_mean']:.4f} | {o['baseline_mean']:.4f} | "
            f"{r['pde_mean']:.4f} | {o['pde_mean']:.4f} | "
            f"{r['t_pvalue']:.4f} | {o['t_pvalue']:.4f} | "
            f"{r['wilcoxon_pvalue']:.4f} | {o['wilcoxon_pvalue']:.4f} | "
            f"{r['significant']} | {o['significant']} |"
        )
    agree = sum(
        ref["comparison_results"][m]["significant"]
        == ours["comparison_results"][m]["significant"]
        for m in _METRICS
    )
    lines += [
        "",
        f"Verdict agreement: {agree}/4 metrics.  Raw pooled arrays and",
        f"comparisons: `{ART.relative_to(REPO)}/{{reference,ours}}/`.",
        "",
    ]
    from parity_run import upsert_section

    upsert_section(REPO / "PARITY_RUN.md", title, lines)
    print("\n".join(lines))


if __name__ == "__main__":
    argv = sys.argv[1:]
    if "--contract" in argv:
        argv.remove("--contract")
        _enable_contract()
    step = argv[0] if argv else "report"
    {"data": make_data, "reference": run_reference, "ours": run_ours,
     "report": report}[step]()
