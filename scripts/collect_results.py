"""Collect final eval metrics from a batch of runs into a markdown table.

Usage: python scripts/collect_results.py logs/r2
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

KEYS = [
    ("error/log_norm_const_is", "logZ err (IS)"),
    ("error/log_norm_const_lb_ito", "logZ err (LB-Ito)"),
    ("error/sinkhorn", "Sinkhorn"),
    ("eval/norm_effective_sample_size", "norm. ESS"),
    ("rel_error/avg_stddev", "stddev rel err"),
]


def last_eval_line(path: Path) -> dict | None:
    best = None
    for line in path.read_text().splitlines():
        try:
            m = json.loads(line)
        except json.JSONDecodeError:
            continue
        if any(k in m for k, _ in KEYS):
            best = m
    return best


def fmt(v, suffix: str = ""):
    if v is None:
        return "—"
    if abs(v) >= 100 or (abs(v) < 0.001 and v != 0):
        return f"{v:.2e}{suffix}"
    return f"{v:.4f}{suffix}"


# Known log-normalization constants, used ONLY to recover the
# finite-filtered LB error for runs recorded before the finite variants
# entered log_norm_const_preds (solver/oc.py) and thus lack an
# error/log_norm_const_lb_ito_finite entry. Keyed by run-name prefix.
# funnel/gmm are normalized (logZ=0); mw/mw_50d/rings computed from this
# repo's distributions via their factorized quadrature (conf/target
# presets). Longest prefix wins so "mw_50d_*" never matches "mw".
TARGET_LOGZ = {
    "funnel": 0.0,
    "gmm": 0.0,
    "mw_50d": 42.8172,
    "mw": -0.5411,
    "rings": 2.3049,
}


def lb_ito_value(m: dict, name: str) -> tuple[float | None, bool]:
    """LB-Ito error with the filtered fallback convention.

    Primary: error/log_norm_const_lb_ito (unfiltered mean — reference
    parity, /root/reference/sde_sampler/losses/oc.py:109). When that is
    non-finite (>=1 diverged trajectory out of ~100k makes the mean -inf),
    publish the max_rnd-FILTERED error instead (the training filter
    applied at eval; losses/oc.py compute_results_arrays), marked `*` and
    footnoted (n_nonfinite_rnd / n_filtered_rnd are logged alongside in
    metrics.jsonl). Finite-only filtering is insufficient — funnel seed 3
    (logs/r4) has finite ~1e33 rnd outliers that survive it — so the
    finite variant is only the legacy fallback for runs recorded before
    the filtered variant existed. Returns (value, used_fallback).
    """
    import math

    v = m.get("error/log_norm_const_lb_ito")
    if v is None or math.isfinite(v):
        return v, False
    fin = m.get("error/log_norm_const_lb_ito_filtered")
    if fin is None:
        fin = m.get("error/log_norm_const_lb_ito_finite")
    if fin is None:
        pred = m.get("eval/log_norm_const_lb_ito_filtered")
        if pred is None:
            pred = m.get("eval/log_norm_const_lb_ito_finite")
        matches = [
            (prefix, z) for prefix, z in TARGET_LOGZ.items()
            if name.startswith(prefix)
        ]
        true = max(matches, key=lambda p: len(p[0]))[1] if matches else None
        if pred is not None and true is not None:
            fin = abs(pred - true)
    return (fin, True) if fin is not None else (v, False)


def lb_ito_cell(m: dict, name: str) -> str:
    v, fallback = lb_ito_value(m, name)
    return fmt(v, suffix="\\*" if fallback else "")


# Runs that are not paper-scale grid cells (chip-liveness smoke, the
# bf16-vs-f32 quick-start quality pair, Cox — which has its own RESULTS
# section with the 512.6-anchor analysis, the 3k-step fast-path
# production wall-clock probe) stay out of the published table, as do
# quarantined run dirs (marked by a "." in the name, e.g.
# `*.corrupt-dupwriter`, `*.killed-*`).
EXCLUDE_PREFIXES = (
    "smoke", "quick_", "cox", "funnel_fast_prod_probe", "nice_smooth_cpu",
    "probe",  # chip-liveness probes (queue E / r4 queue)
)


def _excluded(name: str) -> bool:
    # *_cpu_trend: scaled-down CPU runs (relay-outage insurance), never
    # comparable to the paper-scale chip cells.
    return (name.startswith(EXCLUDE_PREFIXES) or "." in name
            or name.endswith("_cpu_trend"))


def table(*roots: str) -> str:
    rows = {}
    # Later roots win on name collision (r3 re-runs supersede r2 cells).
    for root in roots:
        for metrics_file in sorted(Path(root).glob("*/metrics.jsonl")):
            name = metrics_file.parent.name
            if _excluded(name):
                continue
            m = last_eval_line(metrics_file)
            if m is None:
                continue
            rows[name] = m
    rows = sorted(rows.items())
    lines = ["| Run | " + " | ".join(label for _, label in KEYS) + " |"]
    lines.append("|" + "---|" * (len(KEYS) + 1))
    starred = False
    for name, m in rows:
        cells = []
        for k, _ in KEYS:
            if k == "error/log_norm_const_lb_ito":
                cell = lb_ito_cell(m, name)
                starred |= cell.endswith("\\*")
            else:
                cell = fmt(m.get(k))
            cells.append(cell)
        lines.append(f"| {name} | " + " | ".join(cells) + " |")
    if starred:
        lines.append("")
        lines.append(
            "\\* finite-filtered LB-Itô (the unfiltered reference-parity "
            "mean is −inf: ≥1 of ~100k eval trajectories diverged; count "
            "in `eval/n_nonfinite_rnd`). Identical to the unfiltered mean "
            "whenever no trajectory diverges."
        )
    return "\n".join(lines)


def seed_table(*roots: str) -> str:
    """Aggregate `<cell>` + `<cell>_seedN` replicates into mean ± std rows.

    Seed 1 is the default seed used by the plain cell run; replicates are
    suffixed `_seedN`. Only cells with >=2 replicates are listed.
    """
    import re

    import numpy as np

    groups: dict[str, dict[int, dict]] = {}
    for root in roots:
        for metrics_file in sorted(Path(root).glob("*/metrics.jsonl")):
            name = metrics_file.parent.name
            if _excluded(name):
                continue
            match = re.fullmatch(r"(.+?)_seed(\d+)", name)
            base, seed = (match.group(1), int(match.group(2))) if match \
                else (name, 1)
            m = last_eval_line(metrics_file)
            if m is not None:
                # later roots win for the same (base, seed)
                groups.setdefault(base, {})[seed] = m
    lines = [
        "| Cell (n seeds) | "
        + " | ".join(label for _, label in KEYS) + " |",
        "|" + "---|" * (len(KEYS) + 1),
    ]
    for base, by_seed in sorted(groups.items()):
        if len(by_seed) < 2:
            continue
        cells = []
        for k, _ in KEYS:
            if k == "error/log_norm_const_lb_ito":
                # same fallback convention as the grid table: diverged-
                # trajectory seeds contribute their finite-filtered error
                pairs = [lb_ito_value(m, base) for m in by_seed.values()]
                vals = [v for v, _ in pairs if v is not None
                        and np.isfinite(v)]
                star = "\\*" if any(fb for _, fb in pairs) else ""
            else:
                vals = [m[k] for m in by_seed.values() if k in m]
                vals = [v for v in vals if np.isfinite(v)]
                star = ""
            if not vals:
                cells.append("—")
                continue
            mean, std = float(np.mean(vals)), float(np.std(vals, ddof=1))
            cells.append(f"{fmt(mean)} ± {fmt(std)}{star}")
        lines.append(f"| {base} ({len(by_seed)}) | " + " | ".join(cells) + " |")
    return "\n".join(lines)


START, END = "<!-- GRID_TABLE_START -->", "<!-- GRID_TABLE_END -->"
SEED_START, SEED_END = "<!-- SEED_TABLE_START -->", "<!-- SEED_TABLE_END -->"

STAR_FOOTNOTE = (
    "\\* finite-filtered LB-Itô (the unfiltered reference-parity "
    "mean is −inf: ≥1 of ~100k eval trajectories diverged; count "
    "in `eval/n_nonfinite_rnd`). Identical to the unfiltered mean "
    "whenever no trajectory diverges."
)

# Rows carrying a permanent caveat (VERDICT r4 #5: no unannotated
# known-degenerate rows in the published table). Keyed by run name;
# rendered with a dagger suffix + the footnote below.
DAGGER_ROWS = {"nice_dis_lv"}
DAGGER_FOOTNOTE = (
    "&dagger; known-degenerate target, NOT a sampler failure: this row's "
    "flow is the round-2 sharp synthetic NICE checkpoint whose pixel-noise "
    "pathology was root-caused in round 3 (noise baked into 4000 fixed "
    "dataset points ⇒ the flow memorizes sub-entropy slabs; see the "
    "nice_dis_lv discussion below). The tractable replacement target is "
    "`nice_smooth` (validated flow, `bin/validate_nice_smooth.py`); its "
    "60k-step cell becomes the primary NICE row when it lands."
)


def _parse_rows(block: str) -> dict[str, str]:
    """Row-name -> full rendered '| name | ... |' line from a table block."""
    rows = {}
    for line in block.splitlines():
        line = line.strip()
        if not line.startswith("|") or line.startswith("|---") \
                or line.startswith("| Run") or line.startswith("| Cell"):
            continue
        name = line.split("|")[1].strip().replace("&dagger;", "")
        rows[name] = line
    return rows


def _merge_grid(old_block: str, roots: list[str]) -> str:
    """Merge freshly-computed rows over the previously rendered ones.

    The rendered GRID_TABLE is the only durable record of cells whose raw
    metrics.jsonl died with a VM reboot (logs/ is untracked; see CLAUDE.md
    round-4 notes), so a refresh must never drop rows it cannot recompute:
    old rows survive verbatim unless a run of the same name exists under
    the current roots.
    """
    rows = _parse_rows(old_block)
    rows.update(_parse_rows(table(*roots)))
    lines = ["| Run | " + " | ".join(label for _, label in KEYS) + " |",
             "|" + "---|" * (len(KEYS) + 1)]
    for name in sorted(rows):
        line = rows[name]
        if name in DAGGER_ROWS and "&dagger;" not in line:
            line = line.replace(f"| {name} |", f"| {name}&dagger; |", 1)
        lines.append(line)
    if any("\\*" in line for line in lines[2:]):
        lines += ["", STAR_FOOTNOTE]
    if any("&dagger;" in line for line in lines[2:]):
        lines += ["", DAGGER_FOOTNOTE]
    return "\n".join(lines)


def _merge_seed(old_block: str, roots: list[str]) -> str:
    """Merge seed-table rows; a recomputed row wins only when it aggregates
    at least as many replicates as the rendered one (raw metrics for old
    replicates may no longer exist, making a recomputed row a regression).
    """
    import re

    def n_of(name: str) -> int:
        match = re.search(r"\((\d+)\)$", name)
        return int(match.group(1)) if match else 0

    old = _parse_rows(old_block)
    new = _parse_rows(seed_table(*roots))
    base = lambda name: re.sub(r"\s*\(\d+\)$", "", name)  # noqa: E731
    rows = {base(k): (k, v) for k, v in old.items()}
    for k, v in new.items():
        b = base(k)
        if b not in rows or n_of(k) >= n_of(rows[b][0]):
            rows[b] = (k, v)
    lines = ["| Cell (n seeds) | "
             + " | ".join(label for _, label in KEYS) + " |",
             "|" + "---|" * (len(KEYS) + 1)]
    lines += [rows[b][1] for b in sorted(rows)]
    return "\n".join(lines)


def update_results(roots: list[str], results_md: Path):
    """Merge fresh runs into the marked grid/seed-table blocks in RESULTS.md."""
    text = results_md.read_text()
    head, rest = text.split(START, 1)
    old_block, tail = rest.split(END, 1)
    text = head + START + "\n" + _merge_grid(old_block, roots) + "\n" + END + tail
    if SEED_START in text:
        head, rest = text.split(SEED_START, 1)
        old_block, tail = rest.split(SEED_END, 1)
        text = head + SEED_START + "\n" + _merge_seed(old_block, roots) + "\n" \
            + SEED_END + tail
    results_md.write_text(text)


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument(
        "roots", nargs="*",
        default=["results/r4", "logs/r4", "results/r5", "logs/r5"],
    )
    parser.add_argument(
        "--update-results", action="store_true",
        help="merge fresh runs into the marked grid-table block in RESULTS.md",
    )
    args = parser.parse_args()
    roots = args.roots or ["results/r4", "logs/r4", "results/r5", "logs/r5"]
    if args.update_results:
        update_results(roots, Path(__file__).parents[1] / "RESULTS.md")
    print(table(*roots))
