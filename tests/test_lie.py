"""Closed-form and round-trip tests for SO(3)/SE(3) ops (SURVEY.md §4:
numeric unit tests vs closed-form values)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libcml_tpu.core import (
    SE3,
    se3_exp,
    se3_log,
    se3_retract,
    skew,
    so3_exp,
    so3_log,
    quat_to_matrix,
    matrix_to_quat,
)


def random_twists(rng, n, scale=1.0):
    return jnp.asarray(rng.normal(size=(n, 6)) * scale, dtype=jnp.float32)


def test_so3_exp_closed_form():
    # 90 degrees about z
    w = jnp.array([0.0, 0.0, np.pi / 2], dtype=jnp.float32)
    R = so3_exp(w)
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
    np.testing.assert_allclose(np.asarray(R), expected, atol=1e-6)


def test_so3_exp_log_roundtrip(rng):
    w = jnp.asarray(rng.normal(size=(64, 3)), dtype=jnp.float32)
    # keep |w| < pi for unique log
    w = w / (1.0 + jnp.linalg.norm(w, axis=-1, keepdims=True)) * 3.0
    w2 = so3_log(so3_exp(w))
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=2e-5)


def test_so3_small_angle():
    w = jnp.array([[1e-9, 0, 0], [0.0, 0.0, 0.0]], dtype=jnp.float32)
    R = so3_exp(w)
    np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-7)
    assert np.all(np.isfinite(np.asarray(so3_log(R))))


def test_so3_near_pi():
    for axis in [[1, 0, 0], [0, 1, 0], [0, 0, 1], [0.6, 0.8, 0.0]]:
        w = jnp.asarray(np.array(axis) * (np.pi - 1e-4), dtype=jnp.float32)
        w2 = so3_log(so3_exp(w))
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-2)


def test_orthonormality(rng):
    w = jnp.asarray(rng.normal(size=(32, 3)), dtype=jnp.float32)
    R = so3_exp(w)
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    np.testing.assert_allclose(
        np.asarray(R @ jnp.swapaxes(R, -1, -2)), np.asarray(eye), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)


def test_se3_exp_log_roundtrip(rng):
    xi = random_twists(rng, 64, scale=0.8)
    T = se3_exp(xi)
    xi2 = se3_log(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=2e-4)


def test_se3_compose_inverse(rng):
    xi = random_twists(rng, 16, 0.5)
    T = se3_exp(xi)
    I = T.compose(T.inverse())
    np.testing.assert_allclose(np.asarray(I.R), np.broadcast_to(np.eye(3), I.R.shape), atol=1e-5)
    np.testing.assert_allclose(np.asarray(I.t), 0.0, atol=1e-5)


def test_se3_action_matches_matrix(rng):
    xi = random_twists(rng, 8, 0.5)
    T = se3_exp(xi)
    x = jnp.asarray(rng.normal(size=(8, 3)), dtype=jnp.float32)
    via_struct = T.apply(x)
    M = T.matrix34()
    xh = jnp.concatenate([x, jnp.ones((8, 1))], axis=-1)
    via_matrix = jnp.einsum("nij,nj->ni", M, xh)
    np.testing.assert_allclose(np.asarray(via_struct), np.asarray(via_matrix), atol=1e-5)


def test_se3_to_relative(rng):
    # b.to(a) composed with a gives b:  (b ∘ a^-1) ∘ a = b
    xa, xb = random_twists(rng, 2, 0.5)
    a, b = se3_exp(xa), se3_exp(xb)
    rel = b.to(a)
    back = rel.compose(a)
    np.testing.assert_allclose(np.asarray(back.R), np.asarray(b.R), atol=1e-5)
    np.testing.assert_allclose(np.asarray(back.t), np.asarray(b.t), atol=1e-5)


def test_retract_identity_at_zero(rng):
    xi = random_twists(rng, 4, 0.5)
    T = se3_exp(xi)
    T2 = se3_retract(T, jnp.zeros((4, 6)))
    np.testing.assert_allclose(np.asarray(T2.R), np.asarray(T.R), atol=1e-7)


def test_adjoint(rng):
    # Adjoint identity: exp(Adj_T xi) = T exp(xi) T^-1
    xiT = random_twists(rng, 1, 0.5)[0]
    xi = random_twists(rng, 1, 0.1)[0]
    T = se3_exp(xiT)
    lhs = se3_exp(T.adjoint() @ xi)
    rhs = T.compose(se3_exp(xi)).compose(T.inverse())
    np.testing.assert_allclose(np.asarray(lhs.R), np.asarray(rhs.R), atol=1e-4)
    np.testing.assert_allclose(np.asarray(lhs.t), np.asarray(rhs.t), atol=1e-4)


def test_quat_roundtrip(rng):
    w = jnp.asarray(rng.normal(size=(64, 3)), dtype=jnp.float32)
    R = so3_exp(w)
    R2 = quat_to_matrix(matrix_to_quat(R))
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_skew(rng):
    a = jnp.asarray(rng.normal(size=(5, 3)), dtype=jnp.float32)
    b = jnp.asarray(rng.normal(size=(5, 3)), dtype=jnp.float32)
    cross = jnp.einsum("nij,nj->ni", skew(a), b)
    np.testing.assert_allclose(np.asarray(cross), np.cross(np.asarray(a), np.asarray(b)), atol=1e-5)


def test_jit_and_vmap():
    f = jax.jit(lambda w: so3_log(so3_exp(w)))
    w = jnp.array([0.1, -0.2, 0.3], dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(f(w)), np.asarray(w), atol=1e-5)
    g = jax.vmap(so3_exp)
    assert g(jnp.zeros((7, 3))).shape == (7, 3, 3)


def test_normalized_restores_so3():
    import numpy as np

    from libcml_tpu.core.lie import SE3, se3_exp

    rng = np.random.default_rng(0)
    R_bad = np.asarray(se3_exp(jnp.asarray([0.1, 0, 0, 0.2, 0.1, 0]).astype(jnp.float32)).R)
    R_bad = R_bad * 0.95 + rng.normal(0, 0.01, (3, 3))
    T = SE3(R=jnp.asarray(R_bad, jnp.float32), t=jnp.zeros(3)).normalized()
    R = np.asarray(T.R)
    assert np.abs(R @ R.T - np.eye(3)).max() < 1e-5
    assert np.linalg.det(R) > 0.999


def test_motion_model_squaring_stays_orthonormal():
    """pred = curr ∘ prev^-1 ∘ curr doubles orthonormality error per step;
    normalized() must keep det(R) at 1 over hundreds of iterations (the
    f32 defect otherwise collapses det within ~25 frames)."""
    import numpy as np

    from libcml_tpu.core.lie import SE3, se3_exp

    rng = np.random.default_rng(1)
    prev = SE3.identity()
    curr = se3_exp(jnp.asarray(rng.normal(0, 0.05, 6), jnp.float32))
    for _ in range(100):
        delta = curr.compose(prev.inverse())
        pred = delta.compose(curr).normalized()
        prev, curr = curr, pred
    det = np.linalg.det(np.asarray(curr.R))
    assert abs(det - 1.0) < 1e-4, f"det drifted to {det}"
