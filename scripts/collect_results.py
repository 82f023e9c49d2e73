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


def main(root: str):
    rows = []
    for metrics_file in sorted(Path(root).glob("*/metrics.jsonl")):
        name = metrics_file.parent.name
        m = last_eval_line(metrics_file)
        if m is None:
            continue
        rows.append((name, m))
    header = "| Run | " + " | ".join(label for _, label in KEYS) + " |"
    print(header)
    print("|" + "---|" * (len(KEYS) + 1))
    for name, m in rows:
        cells = " | ".join(fmt(m.get(k)) for k, _ in KEYS)
        print(f"| {name} | {cells} |")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "logs/r2")
