"""Evaluation harness: run-the-SLAM experiment runner with a JSON result
cache, ATE/RPE batteries and parameter sweeps.

TPU-native replacement for the reference's Python evaluation harness
(reference: evaluation/slam.py — ModSLAM process wrapper + binary-hash
identity; evaluation/evaluator.py:30-41 — evo APE/RPE rmse; evaluation/
database.py:18-31 — JSON result cache keyed by (binary hash, config,
dataset), "experiences never run twice" README.md:176; evaluation/statson.py
— ATE battery over sequences; evaluation/bruteforce.py + genetic.py —
parameter sweeps).

Differences by design: the reference shells out to a compiled binary and
hashes it; here runs are in-process (the "binary" identity is the package
source hash), and the sweep tier is embarrassingly parallel across hosts —
each host takes a slice of the experiment list (the DCN tier of SURVEY.md
§2.10; no communication needed beyond the shared cache directory)."""

from __future__ import annotations

import dataclasses
import functools
import hashlib
import json
import os
import time
from typing import Any, Callable, Iterable

import numpy as np

from libcml_tpu.eval.trajectory import ate_rmse, rpe_rmse


@functools.lru_cache(maxsize=1)
def _code_hash() -> str:
    """Hash of the package source — the reference keys its cache on the
    binary's hash so stale results are never reused (slam.py getHash).
    Computed once per process (the reference hashes its binary once,
    slam.py getHash); the source cannot change mid-run."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    for dirpath, _, files in sorted(os.walk(root)):
        for f in sorted(files):
            if f.endswith(".py"):
                with open(os.path.join(dirpath, f), "rb") as fh:
                    h.update(fh.read())
    return h.hexdigest()[:16]


def _config_key(config: Any) -> str:
    if dataclasses.is_dataclass(config):
        config = dataclasses.asdict(config)
    return hashlib.sha256(
        json.dumps(config, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


class ResultDatabase:
    """JSON experiment cache: (code hash, config, dataset) -> metrics.
    An experiment already in the database is never run twice
    (reference: database.py:18-31)."""

    def __init__(self, path: str = "results/experiments.json"):
        self.path = path
        self._db: dict[str, dict] = {}
        if os.path.isfile(path):
            with open(path) as f:
                self._db = json.load(f)

    def key(self, dataset: str, config: Any, extra: str = "") -> str:
        """Cache identity. `extra` carries run parameters that change the
        result but live outside the config object (max_frames, the odometry
        class) — omitting them would let a truncated run shadow a full one."""
        return f"{_code_hash()}:{_config_key(config)}:{dataset}:{extra}"

    def get(self, dataset: str, config: Any, extra: str = "") -> dict | None:
        return self._db.get(self.key(dataset, config, extra))

    def put(self, dataset: str, config: Any, metrics: dict, extra: str = ""):
        self._db[self.key(dataset, config, extra)] = metrics
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._db, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)


def run_sequence(
    dataset_path: str,
    config: Any = None,
    odometry_factory: Callable | None = None,
    max_frames: int = 0,
    db: ResultDatabase | None = None,
) -> dict:
    """Run the SLAM over one sequence, compute ATE/RPE vs groundtruth when
    available, cache the result. Returns the metrics dict
    (reference: statson.py per-sequence entry)."""
    from libcml_tpu.data.capture import load_dataset
    from libcml_tpu.models.direct.config import DirectConfig
    from libcml_tpu.runtime.hybrid import HybridOdometry

    factory = odometry_factory or HybridOdometry
    extra = f"{getattr(factory, '__qualname__', str(factory))}:{max_frames}"
    if db is not None:
        hit = db.get(dataset_path, config, extra)
        if hit is not None:
            return {**hit, "cached": True}

    cap = load_dataset(dataset_path)
    cfg = config or DirectConfig()
    # full calibration: device-side rectification + photometric correction
    odo = factory(cap.calibration, cfg)

    t0 = time.time()
    n = 0
    gt_poses = []
    for frame in cap.frames():
        odo.process(frame.image, frame.timestamp,
                    gt_pose_c2w=frame.gt_pose_c2w)
        gt_poses.append(frame.gt_pose_c2w)
        n += 1
        if max_frames and n >= max_frames:
            break
    wall = time.time() - t0

    ts, est = odo.trajectory_c2w()
    metrics: dict[str, Any] = {
        "dataset": dataset_path,
        "frames": n,
        "wall_s": round(wall, 3),
        "fps": round(n / max(wall, 1e-9), 2),
        "cached": False,
    }
    gts = [g for g in gt_poses if g is not None]
    if len(gts) == len(gt_poses) and len(gts) >= 3:
        gt_c2w = np.asarray(gts)
        metrics["ate_rmse"] = ate_rmse(est[:, :3, 3], gt_c2w[:, :3, 3])
        metrics["rpe_rmse"] = rpe_rmse(est, gt_c2w)
    if db is not None:
        db.put(dataset_path, config, metrics, extra)
    return metrics


def statson(
    sequences: Iterable[str],
    config: Any = None,
    db: ResultDatabase | None = None,
    **kw,
) -> list[dict]:
    """ATE battery over sequences (reference: statson.py)."""
    out = []
    for seq in sequences:
        m = run_sequence(seq, config, db=db, **kw)
        print(f"STAT ate {seq} {m.get('ate_rmse', float('nan')):.5f}")
        out.append(m)
    return out


def bruteforce_sweep(
    sequences: list[str],
    base_config: Any,
    grid: dict[str, list],
    db: ResultDatabase | None = None,
    host_index: int = 0,
    num_hosts: int = 1,
    **kw,
) -> list[dict]:
    """Grid parameter sweep (reference: bruteforce.py). `grid` maps dotted
    config keys to candidate values; the cartesian product is sharded
    round-robin across hosts (the multi-host evaluation tier — each host
    owns a disjoint slice, results meet in the shared cache)."""
    import itertools

    from libcml_tpu.runtime.config import apply_config

    keys = sorted(grid)
    combos = list(itertools.product(*(grid[k] for k in keys)))
    results = []
    for i, combo in enumerate(combos):
        if i % num_hosts != host_index:
            continue
        settings = dict(zip(keys, combo))
        cfg = apply_config(base_config, settings)
        for seq in sequences:
            m = run_sequence(seq, cfg, db=db, **kw)
            results.append({**m, "settings": settings})
    return results
