"""Matcher suite + BoW vocabulary tests (small shapes, CPU-fast)."""

import jax.numpy as jnp
import numpy as np
import pytest

from libcml_tpu.models.indirect import matching as M
from libcml_tpu.models.indirect import bow as B


def _fake_descs(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


def _perturb(desc, n_flip, rng):
    out = desc.copy()
    for i in range(len(out)):
        for _ in range(n_flip):
            w = rng.integers(0, 8)
            b = rng.integers(0, 32)
            out[i, w] ^= np.uint32(1 << b)
    return out


def test_match_descriptors_recovers_permutation():
    rng = np.random.default_rng(1)
    N = 64
    d_t = _fake_descs(N, 1)
    perm = rng.permutation(N)
    d_q = _perturb(d_t[perm], 3, rng)
    res = M.match_descriptors(
        jnp.asarray(d_q), jnp.ones(N, bool), jnp.asarray(d_t), jnp.ones(N, bool)
    )
    ok = np.asarray(res.valid)
    assert ok.sum() >= N * 0.9
    assert np.all(np.asarray(res.idx)[ok] == perm[ok])


def test_match_window_restricts_radius():
    rng = np.random.default_rng(2)
    N = 32
    d = _fake_descs(N, 2)
    uv = rng.uniform(0, 200, (N, 2)).astype(np.float32)
    # identical descriptors everywhere -> only the window constraint can
    # disambiguate; train points displaced by 3 px
    res = M.match_window(
        jnp.asarray(d), jnp.asarray(uv), jnp.ones(N, bool),
        jnp.asarray(d), jnp.asarray(uv + 3.0), jnp.ones(N, bool),
        radius=10.0, ratio=1.1,
    )
    ok = np.asarray(res.valid)
    assert np.all(np.asarray(res.idx)[ok] == np.arange(N)[ok])
    assert ok.sum() >= N * 0.8


def test_orientation_check_rejects_rotated_outliers():
    rng = np.random.default_rng(3)
    N = 100
    ang_t = rng.uniform(0, 2 * np.pi, N).astype(np.float32)
    ang_q = ang_t + 0.1  # consistent rotation
    ang_q[:10] = ang_t[:10] + np.pi  # 10 inconsistent
    valid = np.ones(N, bool)
    out = M.orientation_check(
        jnp.asarray(ang_q), jnp.asarray(ang_t),
        jnp.arange(N, dtype=jnp.int32), jnp.asarray(valid),
    )
    out = np.asarray(out)
    assert out[10:].sum() >= 85
    assert out[:10].sum() == 0


def test_vfc_filter_rejects_field_outliers():
    rng = np.random.default_rng(4)
    N = 128
    uv_q = rng.uniform(0, 300, (N, 2)).astype(np.float32)
    uv_t = uv_q + np.array([5.0, -3.0], np.float32)  # smooth field
    uv_t[:12] += rng.uniform(-60, 60, (12, 2)).astype(np.float32)  # outliers
    keep = M.vfc_filter(jnp.asarray(uv_q), jnp.asarray(uv_t),
                        jnp.ones(N, bool))
    keep = np.asarray(keep)
    assert keep[12:].mean() > 0.9
    assert keep[:12].mean() < 0.3


def test_vocabulary_roundtrip_and_scoring(tmp_path):
    rng = np.random.default_rng(5)
    base = _fake_descs(256, 5)
    voc = B.train_vocabulary(base, k=4, depth=2, iters=4)
    assert voc.num_words > 4

    d1 = base[:64]
    d2 = _perturb(d1, 4, rng)
    d3 = _fake_descs(64, 99)
    v1 = voc.bow_vector(jnp.asarray(d1), jnp.ones(64, bool))
    v2 = voc.bow_vector(jnp.asarray(d2), jnp.ones(64, bool))
    v3 = voc.bow_vector(jnp.asarray(d3), jnp.ones(64, bool))
    s_sim = float(B.score_l1(v1, v2))
    s_dis = float(B.score_l1(v1, v3))
    assert s_sim > s_dis

    p = str(tmp_path / "voc.npz")
    voc.save(p)
    voc2 = B.BinaryVocabulary.load(p)
    assert np.array_equal(np.asarray(voc2.words), np.asarray(voc.words))


def test_keyframe_database_query():
    rng = np.random.default_rng(6)
    base = _fake_descs(256, 6)
    voc = B.train_vocabulary(base, k=4, depth=2, iters=4)
    db = B.KeyframeDatabase(voc)
    kf_descs = {}
    for kf in range(4):
        d = _fake_descs(64, 100 + kf)
        kf_descs[kf] = d
        db.add(kf, jnp.asarray(d), jnp.ones(64, bool))
    q = _perturb(kf_descs[2], 3, rng)
    res = db.query(jnp.asarray(q), jnp.ones(64, bool))
    assert res and res[0][0] == 2
    db.remove(2)
    res = db.query(jnp.asarray(q), jnp.ones(64, bool))
    assert all(kf != 2 for kf, _ in res)


def test_pallas_resolve_matches_xla():
    """The fused Pallas match-resolution kernel (ops/pallas_match.py,
    interpreted on the CPU test platform) must agree exactly with the XLA
    formulation — best index, distance, second-best, column-best — across
    masks, pair constraints and non-multiple-of-tile sizes."""
    import numpy as np

    from libcml_tpu.models.indirect.orb import hamming_matrix
    from libcml_tpu.ops.pallas_match import hamming_resolve_pallas

    rng = np.random.default_rng(7)
    N, Mn = 67, 301     # deliberately not multiples of the tile
    dq = jnp.asarray(rng.integers(0, 2**32, (N, 8), dtype=np.uint32))
    dt = jnp.asarray(rng.integers(0, 2**32, (Mn, 8), dtype=np.uint32))
    mq = jnp.asarray(rng.random(N) > 0.2)
    mt = jnp.asarray(rng.random(Mn) > 0.2)
    pair = jnp.asarray(rng.random((N, Mn)) > 0.3)

    d1, d2, idx, col_row = hamming_resolve_pallas(
        dq, mq, dt, mt, pair, tile_m=64, interpret=True)

    D = np.asarray(hamming_matrix(dq, dt)).astype(np.int64)
    mask = np.asarray(mq)[:, None] & np.asarray(mt)[None, :] \
        & np.asarray(pair)
    Dm = np.where(mask, D, 257)
    ref_idx = Dm.argmin(1)
    ref_d1 = Dm.min(1)
    D2 = Dm.copy()
    D2[np.arange(N), ref_idx] = 257
    ref_d2 = D2.min(1)
    ref_col = Dm.argmin(0)

    np.testing.assert_array_equal(np.asarray(d1), np.minimum(ref_d1, 257))
    np.testing.assert_array_equal(np.asarray(d2), np.minimum(ref_d2, 257))
    # index parity matters only where a real (unmasked) match exists
    has = ref_d1 <= 256
    np.testing.assert_array_equal(np.asarray(idx)[has], ref_idx[has])
    has_c = Dm.min(0) <= 256
    np.testing.assert_array_equal(np.asarray(col_row)[has_c],
                                  ref_col[has_c])
