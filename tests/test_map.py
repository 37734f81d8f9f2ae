"""Global map layer: groups, deform-graph pose composition, covisibility,
GT error refresh, export round-trip (reference: src/cml/map/Map.{h,cpp},
Frame deform graph Frame.cpp:51-92)."""

import numpy as np

from libcml_tpu.map import SlamMap


def _pose(tx=0.0, tz=0.0, yaw=0.0):
    c, s = np.cos(yaw), np.sin(yaw)
    M = np.eye(4)
    M[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    M[0, 3] = tx
    M[2, 3] = tz
    return M


def test_groups_and_membership():
    m = SlamMap()
    kf_bit = m.groups.frame_group("KEYFRAME")
    i0 = m.add_frame(0.0, _pose())
    i1 = m.add_frame(1.0, _pose(tz=-0.1))
    m.set_keyframe(i0)
    assert list(m.frames_in_group("KEYFRAME")) == [i0]
    assert set(m.frames_in_group("VALIDFRAME")) == {i0, i1}
    m.set_keyframe(i0, False)
    assert list(m.frames_in_group("KEYFRAME")) == []
    # custom group allocation is stable
    g = m.groups.frame_group("MYGROUP")
    assert g == m.groups.frame_group("MYGROUP") and g != kf_bit


def test_deform_graph_follows_keyframe():
    m = SlamMap()
    kf = m.add_frame(0.0, _pose(tz=-1.0))
    m.set_keyframe(kf)
    # non-keyframe anchored to kf with a relative pose
    T_rel = _pose(tx=0.05)
    f = m.add_frame(1.0, T_rel, ref_frame=kf)
    np.testing.assert_allclose(m.pose_w2c(f), T_rel @ m.pose_w2c(kf))
    # move the keyframe (BA update): the anchored frame follows
    newT = _pose(tz=-1.2, yaw=0.01)
    m.set_pose(kf, newT)
    np.testing.assert_allclose(m.pose_w2c(f), T_rel @ newT)


def test_covisibility_counts():
    m = SlamMap()
    a = m.add_frame(0.0, _pose())
    b = m.add_frame(1.0, _pose(tz=-0.1))
    c = m.add_frame(2.0, _pose(tz=-0.2))
    pts = m.add_points(np.random.default_rng(0).normal(size=(10, 3)))
    m.add_observations(a, pts[:6])
    m.add_observations(b, pts[3:9])
    m.add_observations(c, pts[8:])
    cov = m.covisibility()
    assert cov[a][b] == 3          # points 3,4,5
    assert cov[b][a] == 3
    assert cov[b][c] == 1          # point 8
    assert a not in cov.get(c, {})
    assert cov == {**cov}  # plain dict


def test_gt_error_and_export(tmp_path):
    m = SlamMap()
    rng = np.random.default_rng(1)
    for i in range(10):
        gt_c2w = _pose(tz=0.1 * i)
        est_w2c = np.linalg.inv(gt_c2w)
        est_w2c[:3, 3] += rng.normal(0, 1e-3, 3)
        m.add_frame(float(i), est_w2c, gt_c2w=gt_c2w)
    errs = m.refresh_error_from_groundtruth()
    assert errs is not None and errs["ate_rmse"] < 5e-3
    assert np.isfinite(errs["rpe_rmse"])

    m.export_results(str(tmp_path), "run")
    for name in ("run_tum.txt", "run_kitti.txt", "run.csv",
                 "run_gt_tum.txt", "run_gt_kitti.txt"):
        assert (tmp_path / name).exists(), name
    from libcml_tpu.eval.trajectory import load_tum_trajectory

    ts, poses = load_tum_trajectory(str(tmp_path / "run_tum.txt"))
    assert len(ts) == 10
    _, est = m.trajectory_c2w()
    np.testing.assert_allclose(poses[:, :3, 3], est[:, :3, 3], atol=1e-5)


def test_covisibility_vectorized_matches_bruteforce():
    """The repeat/tile pair-expansion must agree with a naive per-point
    double loop (the pre-round-4 implementation) on random observations."""
    rng = np.random.default_rng(3)
    m = SlamMap()
    for i in range(12):
        m.add_frame(i * 0.1, np.eye(4))
    m.add_points(rng.standard_normal((60, 3)))
    obs = {}
    for kf in range(12):
        pts = rng.integers(0, 60, 25)
        m.add_observations(kf, pts)
        obs[kf] = set(int(p) for p in pts)
    got = m.covisibility()
    for a in range(12):
        for b in range(12):
            if a == b:
                continue
            want = len(obs[a] & obs[b])
            have = got.get(a, {}).get(b, 0)
            assert have == want, (a, b, have, want)


def test_map_scales_to_long_sequences():
    """KITTI-00-scale smoke (scaled to CI budget): deform-chain batch
    resolution and covisibility must be array-speed, not Python-loop speed
    (reference keeps covisibility incremental for the same reason,
    Frame.h:502-554)."""
    import time

    rng = np.random.default_rng(0)
    m = SlamMap(cap_frames=4096)
    for i in range(2000):
        m.add_frame(i * 0.1, np.eye(4),
                    ref_frame=-1 if i % 5 == 0 else (i // 5) * 5 // 5)
    m.add_points(rng.standard_normal((20000, 3)))
    for kf in range(300):
        m.add_observations(kf, rng.integers(0, 20000, 150))
    t0 = time.time()
    ts, c2w = m.trajectory_c2w()
    assert c2w.shape == (2000, 4, 4)
    cov = m.covisibility(min_shared=2)
    assert time.time() - t0 < 2.0
