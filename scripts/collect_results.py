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


def fmt(v):
    if v is None:
        return "—"
    if abs(v) >= 100 or (abs(v) < 0.001 and v != 0):
        return f"{v:.2e}"
    return f"{v:.4f}"


# Runs that are not paper-scale grid cells (chip-liveness smoke, the
# bf16-vs-f32 quick-start quality pair, Cox — which has its own RESULTS
# section with the 512.6-anchor analysis) stay out of the published table.
EXCLUDE_PREFIXES = ("smoke", "quick_", "cox")


def table(*roots: str) -> str:
    rows = {}
    # Later roots win on name collision (r3 re-runs supersede r2 cells).
    for root in roots:
        for metrics_file in sorted(Path(root).glob("*/metrics.jsonl")):
            name = metrics_file.parent.name
            if name.startswith(EXCLUDE_PREFIXES):
                continue
            m = last_eval_line(metrics_file)
            if m is None:
                continue
            rows[name] = m
    rows = sorted(rows.items())
    lines = ["| Run | " + " | ".join(label for _, label in KEYS) + " |"]
    lines.append("|" + "---|" * (len(KEYS) + 1))
    for name, m in rows:
        cells = " | ".join(fmt(m.get(k)) for k, _ in KEYS)
        lines.append(f"| {name} | {cells} |")
    return "\n".join(lines)


START, END = "<!-- GRID_TABLE_START -->", "<!-- GRID_TABLE_END -->"


def update_results(roots: list[str], results_md: Path):
    """Rewrite the marked grid-table block in RESULTS.md."""
    text = results_md.read_text()
    head, rest = text.split(START, 1)
    _, tail = rest.split(END, 1)
    results_md.write_text(
        head + START + "\n" + table(*roots) + "\n" + END + tail
    )


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument(
        "roots", nargs="*", default=["logs/r2", "logs/r3"],
    )
    parser.add_argument(
        "--update-results", action="store_true",
        help="rewrite the marked grid-table block in RESULTS.md",
    )
    args = parser.parse_args()
    roots = args.roots or ["logs/r2", "logs/r3"]
    if args.update_results:
        update_results(roots, Path(__file__).parents[1] / "RESULTS.md")
    print(table(*roots))
