"""Evaluation-harness tests: result cache semantics + an end-to-end run
over a synthetic KITTI-layout sequence (loader -> hybrid SLAM -> ATE)."""

import json
import os

import numpy as np
import pytest

from libcml_tpu.eval.harness import (
    ResultDatabase,
    bruteforce_sweep,
    run_sequence,
    statson,
)
from libcml_tpu.models.direct.config import DirectConfig

PIL = pytest.importorskip("PIL")
from PIL import Image

CFG = DirectConfig(
    num_levels=3, max_points=1024, points_per_kf=256, init_points=256,
    max_frames=5, tracker_iters=8, init_iters=12, ba_iters=6,
    kf_flow_threshold=0.55, activate_min_traces=2, activate_max_relwidth=0.35,
    outlier_energy=300.0,
)


@pytest.fixture(scope="module")
def kitti_synth(tmp_path_factory):
    """Render a synthetic scene into a KITTI directory layout so the full
    loader -> SLAM -> eval chain is exercised."""
    from libcml_tpu.core.camera import PinholeCamera
    from libcml_tpu.data.synthetic import SyntheticScene, forward_trajectory

    root = tmp_path_factory.mktemp("kitti") / "04"
    (root / "image_0").mkdir(parents=True)
    cam = PinholeCamera.make(110.0, 110.0, 79.5, 59.5, 160, 120)
    sc = SyntheticScene.default(cam, seed=3)
    poses = forward_trajectory(12, step=0.08, yaw_rate=0.003)
    lines = []
    times = []
    for i, (R, t) in enumerate(poses):
        img, _ = sc.render(R, t)
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8), mode="L").save(
            root / "image_0" / f"{i:06d}.png"
        )
        c2w = np.linalg.inv(
            np.block([[R, t[:, None]], [np.zeros((1, 3)), np.ones((1, 1))]])
        )
        lines.append(" ".join(f"{v:.9f}" for v in c2w[:3].reshape(-1)))
        times.append(f"{0.1 * i:.6f}")
    (root / "calib.txt").write_text(
        "P0: 110.0 0.0 79.5 0.0 0.0 110.0 59.5 0.0 0.0 0.0 1.0 0.0\n"
    )
    (root / "times.txt").write_text("\n".join(times) + "\n")
    (root / "poses.txt").write_text("\n".join(lines) + "\n")
    return str(root)


def test_run_sequence_and_cache(kitti_synth, tmp_path):
    db = ResultDatabase(str(tmp_path / "db.json"))
    m = run_sequence(kitti_synth, CFG, db=db)
    assert m["frames"] == 12
    assert not m["cached"]
    assert "ate_rmse" in m and np.isfinite(m["ate_rmse"])
    assert m["ate_rmse"] < 0.15
    # second run must come from the cache, not a re-run
    m2 = run_sequence(kitti_synth, CFG, db=db)
    assert m2["cached"]
    assert m2["ate_rmse"] == m["ate_rmse"]
    # the cache file is valid JSON on disk
    with open(db.path) as f:
        assert len(json.load(f)) == 1


def test_statson_battery(kitti_synth, tmp_path, capsys):
    db = ResultDatabase(str(tmp_path / "db.json"))
    out = statson([kitti_synth], CFG, db=db, max_frames=8)
    assert len(out) == 1
    assert "STAT ate" in capsys.readouterr().out


def test_bruteforce_sweep_shards(kitti_synth, tmp_path):
    db = ResultDatabase(str(tmp_path / "db.json"))
    grid = {"tracker_iters": [6, 8]}
    r0 = bruteforce_sweep([kitti_synth], CFG, grid, db=db,
                          host_index=0, num_hosts=2, max_frames=6)
    r1 = bruteforce_sweep([kitti_synth], CFG, grid, db=db,
                          host_index=1, num_hosts=2, max_frames=6)
    # disjoint host slices cover the grid exactly once
    assert len(r0) == 1 and len(r1) == 1
    assert r0[0]["settings"] != r1[0]["settings"]


def test_genetic_search_converges(monkeypatch, tmp_path):
    """Evolutionary sweep on a stubbed quadratic objective: the best ATE
    must improve across generations (reference: evaluation/genetic.py)."""
    import dataclasses

    from libcml_tpu.eval import harness

    @dataclasses.dataclass(frozen=True)
    class Cfg:
        a: float = 0.0
        b: float = 0.0

    def fake_run_sequence(seq, cfg, db=None, **kw):
        return {"ate_rmse": (cfg.a - 3.0) ** 2 + (cfg.b + 1.0) ** 2}

    monkeypatch.setattr(harness, "run_sequence", fake_run_sequence)
    hist = harness.genetic_search(
        ["seq"], Cfg(), {"a": (-5.0, 5.0), "b": (-5.0, 5.0)},
        generations=8, population=10, seed=1,
    )
    assert hist[-1]["best_ate"] < hist[0]["best_ate"]
    assert hist[-1]["best_ate"] < 0.5
    assert abs(hist[-1]["best"]["a"] - 3.0) < 1.5


def test_plot_results(tmp_path):
    from libcml_tpu.eval.harness import plot_results

    out = plot_results(
        [{"dataset": "seq/a", "ate_rmse": 0.1},
         {"dataset": "seq/b", "ate_rmse": 0.3}],
        str(tmp_path / "plot.png"),
    )
    import os

    assert os.path.isfile(out) and os.path.getsize(out) > 100
