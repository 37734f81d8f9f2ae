"""Collect the round's tracked result battery into benchmarks/results_rNN.json.

VERDICT r4 missing #5: accuracy/speed evidence must be committed and
diffable round over round (the reference's analogue is the JSON result
database its evaluation harness maintains, reference:
evaluation/database.py:18-31). This drives runtime_bench.py over the
standard operating points — direct pipelined (the shipped fast mode),
direct sequential (the accuracy ablation), hybrid pipelined and hybrid
sequential — on the shared 500-frame synthetic KITTI sequence, and writes
one JSON file with fps, ATE, RPE, segments and the per-phase breakdown for
each.

Usage: python benchmarks/collect_results.py [--round 5] [--frames 500]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

POINTS = [
    ("direct_pipelined", ["--mode", "direct", "--pipelined"]),
    ("direct_sequential", ["--mode", "direct"]),
    ("hybrid_pipelined", ["--mode", "hybrid", "--pipelined"]),
    ("hybrid_sequential", ["--mode", "hybrid"]),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=5)
    ap.add_argument("--frames", type=int, default=500)
    ap.add_argument("--warmup", type=int, default=30)
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of operating points")
    args = ap.parse_args()

    sys.path.insert(0, ROOT)
    import bench

    bench.ensure_sequence(args.frames)

    sel = set(args.only.split(",")) if args.only else None
    out_path = os.path.join(ROOT, "benchmarks",
                            f"results_r{args.round:02d}.json")
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            results = json.load(fh)

    for name, flags in POINTS:
        if sel is not None and name not in sel:
            continue
        cmd = [sys.executable,
               os.path.join(ROOT, "benchmarks", "runtime_bench.py"),
               "--frames", str(args.frames), "--warmup", str(args.warmup),
               *flags]
        print(f"[{name}] {' '.join(cmd)}", flush=True)
        t0 = time.time()
        proc = subprocess.run(cmd, capture_output=True, text=True)
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout else ""
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            rec = {"error": (proc.stderr or "no output")[-2000:]}
        rec["wall_s"] = round(time.time() - t0, 1)
        rec["reference"] = {"fps": bench.REF_FPS, "ate": bench.REF_ATE}
        results[name] = rec
        print(f"[{name}] {json.dumps(rec)[:300]}", flush=True)
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=1, sort_keys=True)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
