#!/usr/bin/env python
"""Render LEARNING.md from training-run metrics.

Reads the ``metrics.jsonl`` stream that scripts/train.py writes (one JSON
object per log/eval event) for each given run directory and produces the
in-repo learning evidence the flagship benchmark demands (BASELINE.json
north star: wall-clock to reward threshold; reference eval loop
pql/utils/evaluator.py:106-120):

- a summary table: task, algo, envs, env-steps, wall-clock, best/final
  eval return, threshold, time-to-threshold;
- per-run eval-return curves (sparkline + milestone rows);
- the exact command recorded in the run's config.json.

Usage:
    python scripts/learning_report.py runs/ant_pql runs/allegro_pql \
        thresholds=Ant:5000,AllegroHand:3000 out=LEARNING.md
"""

from __future__ import annotations

import json
import os
import sys

BLOCKS = "▁▂▃▄▅▆▇█"


def spark(values: list[float], width: int = 48) -> str:
    if not values:
        return ""
    if len(values) > width:  # bucket-average down to width
        n = len(values)
        values = [
            sum(values[i * n // width : max(i * n // width + 1, (i + 1) * n // width)])
            / max(1, len(values[i * n // width : max(i * n // width + 1, (i + 1) * n // width)]))
            for i in range(width)
        ]
    lo, hi = min(values), max(values)
    span = (hi - lo) or 1.0
    return "".join(BLOCKS[int((v - lo) / span * (len(BLOCKS) - 1))] for v in values)


def load_run(run_dir: str) -> dict:
    cfg = {}
    cfg_path = os.path.join(run_dir, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cfg = json.load(f)
    evals, train = [], []
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "eval/return" in rec:
                evals.append(rec)
            elif "train/return" in rec:
                train.append(rec)
    return {"dir": run_dir, "cfg": cfg, "evals": evals, "train": train}


def summarize(run: dict, threshold: float | None) -> dict:
    evals, cfg = run["evals"], run["cfg"]
    task = cfg.get("task", "?")
    algo = (cfg.get("algo") or {}).get("name", "?")
    distl = (cfg.get("algo") or {}).get("distl", False)
    last = evals[-1] if evals else {}
    best = max(evals, key=lambda r: r["eval/return"]) if evals else {}
    t_thresh = None
    if threshold is not None:
        for r in evals:
            if r["eval/return"] >= threshold:
                t_thresh = r["time"]
                break
    return {
        "task": task,
        "algo": algo + ("-D" if distl else ""),
        "num_envs": cfg.get("num_envs"),
        "steps": int(last.get("step", 0)),
        "wall_s": round(float(last.get("time", 0.0)), 1),
        "final": round(float(last.get("eval/return", float("nan"))), 2),
        "best": round(float(best.get("eval/return", float("nan"))), 2),
        "threshold": threshold,
        "t_thresh_s": round(t_thresh, 1) if t_thresh is not None else None,
    }


def main(argv: list[str]) -> None:
    out = "LEARNING.md"
    thresholds: dict[str, float] = {}
    run_dirs = []
    for a in argv:
        if a.startswith("out="):
            out = a.split("=", 1)[1]
        elif a.startswith("thresholds="):
            for part in a.split("=", 1)[1].split(","):
                k, v = part.split(":")
                thresholds[k] = float(v)
        else:
            run_dirs.append(a)
    if not run_dirs:
        sys.exit("usage: learning_report.py <run_dir>... [thresholds=Task:val,...] [out=LEARNING.md]")

    missing = [d for d in run_dirs if not os.path.exists(os.path.join(d, "metrics.jsonl"))]
    for d in missing:
        print(f"skipping {d}: no metrics.jsonl", file=sys.stderr)
    run_dirs = [d for d in run_dirs if d not in missing]
    if not run_dirs:
        sys.exit("no usable run dirs")
    runs = [load_run(d) for d in run_dirs]
    rows = [summarize(r, thresholds.get(r["cfg"].get("task"))) for r in runs]

    lines = [
        "# Learning results",
        "",
        "Eval-return curves recorded by `scripts/train.py` (deterministic-policy",
        "evaluation, `pql_tpu/utils/evaluator.py`; the reference's eval loop is",
        "pql/utils/evaluator.py:106-120). Source data: each run dir's",
        "`metrics.jsonl` (committed alongside this file under `runs/`).",
        "",
        "| task | algo | envs | env-steps | wall-clock | best eval | final eval | threshold | time-to-threshold |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for s in rows:
        lines.append(
            f"| {s['task']} | {s['algo']} | {s['num_envs']} | {s['steps']:,} "
            f"| {s['wall_s']:.0f} s | {s['best']} | {s['final']} "
            f"| {s['threshold'] if s['threshold'] is not None else '—'} "
            f"| {str(s['t_thresh_s']) + ' s' if s['t_thresh_s'] is not None else ('not reached' if s['threshold'] is not None else '—')} |"
        )
    lines.append("")

    for run, s in zip(runs, rows):
        evals = run["evals"]
        lines += [
            f"## {s['task']} {s['algo']} @ {s['num_envs']} envs — `{run['dir']}`",
            "",
            f"eval/return over wall-clock ({len(evals)} evals):",
            "",
            "```",
            spark([r["eval/return"] for r in evals]),
            "```",
            "",
            "| wall-clock | env-steps | eval/return |",
            "|---|---|---|",
        ]
        idxs = sorted(set([0, len(evals) // 4, len(evals) // 2, 3 * len(evals) // 4, len(evals) - 1]))
        for i in idxs:
            if 0 <= i < len(evals):
                r = evals[i]
                lines.append(f"| {r['time']:.0f} s | {int(r['step']):,} | {r['eval/return']:.2f} |")
        lines.append("")

    # freeform status/provenance notes survive regeneration: kept in a
    # sibling NOTES file and appended verbatim
    notes = os.path.join(os.path.dirname(os.path.abspath(out)), "LEARNING_NOTES.md")
    if os.path.exists(notes):
        with open(notes) as f:
            lines += [f.read().rstrip(), ""]

    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(runs)} runs)")


if __name__ == "__main__":
    main(sys.argv[1:])
