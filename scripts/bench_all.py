#!/usr/bin/env python
"""Per-family benchmark sweep -> one JSON report.

Runs the flagship bench (Kokoro, bench.py) plus the per-family scripts
(CSM realtime + TTFA, Whisper greedy + beam, generic causal-LM) as
subprocesses, collects their ``--json`` result lines, and writes a combined
report so regressions in non-flagship families are visible round to round
(VERDICT round 1 weak #8).

Usage: python scripts/bench_all.py [--out bench_report.json]
       [--families kokoro,csm,whisper,lm] [--iters 5]

Each family runs serially — only one TPU process at a time (concurrent
jobs serialize on the tunneled chip and poison the numbers, docs/PERF.md).
"""

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def run_json(cmd: list, timeout: int = 3600):
    """Run a bench subprocess; return every JSON object line it printed."""
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable] + cmd, cwd=ROOT, capture_output=True, text=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        # one hung family must not lose the rest of the sweep's report
        return [{"error": f"timeout after {timeout}s",
                 "cmd": " ".join(cmd), "wall_s": round(time.time() - t0, 1)}]
    rows = []
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    if proc.returncode != 0 and not rows:
        rows.append({"error": proc.stderr.strip()[-500:],
                     "cmd": " ".join(cmd)})
    for r in rows:
        r["wall_s"] = round(time.time() - t0, 1)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bench_report.json")
    ap.add_argument(
        "--families",
        default="kokoro,csm,whisper,lm,sts,parakeet,bark,dia,indextts,"
                "spark,voxtral")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    fams = set(args.families.split(","))
    it = str(args.iters)

    report = {}
    if "kokoro" in fams:
        report["kokoro"] = run_json(["bench.py"])
    if "csm" in fams:
        report["csm"] = (
            run_json(["scripts/bench_csm.py", "--json", "--iters", it])
            + run_json(["scripts/bench_csm.py", "--json", "--iters", it,
                        "--batch", "64"])
            + run_json(["scripts/bench_csm.py", "--json", "--iters", it,
                        "--ttfa"])
        )
    if "whisper" in fams:
        report["whisper"] = (
            run_json(["scripts/bench_whisper.py", "--json", "--iters", it])
            + run_json(["scripts/bench_whisper.py", "--json", "--iters", it,
                        "--batch", "4", "--beam", "5"])
        )
    if "lm" in fams:
        report["causal_lm"] = (
            run_json(["scripts/bench_causal_lm.py", "--json", "--iters", it])
            + run_json(["scripts/bench_causal_lm.py", "--json", "--iters", it,
                        "--batch", "8"])
        )
    if "sts" in fams:
        # --prewarm is the serving configuration (docs/PERF.md round-5b)
        report["sts"] = run_json(
            ["scripts/bench_sts.py", "--json", "--turns", it, "--prewarm"])
    if "parakeet" in fams:
        report["parakeet"] = run_json(
            ["scripts/bench_parakeet.py", "--json", "--iters", it])
    if "bark" in fams:
        # b16 is the single-chip capacity sweet spot (b32 OOMs the
        # coarse caches, docs/PERF.md)
        report["bark"] = run_json(
            ["scripts/bench_bark.py", "--json", "--iters", "3",
             "--batch", "16"])
    if "dia" in fams:
        report["dia"] = (
            run_json(["scripts/bench_dia.py", "--json", "--iters", "3"])
            + run_json(["scripts/bench_dia.py", "--json", "--iters", "3",
                        "--batch", "32"])
        )
    if "indextts" in fams:
        report["indextts"] = (
            run_json(["scripts/bench_indextts.py", "--json", "--iters", "3"])
            + run_json(["scripts/bench_indextts.py", "--json", "--iters",
                        "3", "--batch", "16"])
        )
    if "spark" in fams:
        report["spark"] = run_json(
            ["scripts/bench_spark.py", "--json", "--iters", "3"])
        report["spark"] += run_json(
            ["scripts/bench_spark.py", "--json", "--iters", "3",
             "--batch", "32"])
    if "voxtral" in fams:
        report["voxtral"] = run_json(
            ["scripts/bench_voxtral.py", "--json", "--iters", "3"])

    out = ROOT / args.out
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))
    print(f"written: {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
