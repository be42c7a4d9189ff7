import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xrsfm_tpu.utils import geometry as G


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.asarray(q, jnp.float32)


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(0)
    q = random_quats(rng, 32)
    v = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    R = G.quat_to_rotmat(q)
    np.testing.assert_allclose(
        G.quat_rotate(q, v), jnp.einsum("nij,nj->ni", R, v), atol=1e-5
    )


def test_quat_mul_matches_matrix_product():
    rng = np.random.default_rng(1)
    qa, qb = random_quats(rng, 16), random_quats(rng, 16)
    Rab = G.quat_to_rotmat(G.quat_mul(qa, qb))
    np.testing.assert_allclose(
        Rab, G.quat_to_rotmat(qa) @ G.quat_to_rotmat(qb), atol=1e-5
    )


def test_rotmat_quat_roundtrip():
    rng = np.random.default_rng(2)
    q = random_quats(rng, 64)
    # canonical sign w >= 0
    q = q * jnp.where(q[:, :1] < 0, -1.0, 1.0)
    q2 = G.rotmat_to_quat(G.quat_to_rotmat(q))
    np.testing.assert_allclose(q2, q, atol=1e-5)


def test_rotmat_to_quat_edge_cases():
    # 180-degree rotations around each axis (trace = -1, w ~ 0)
    for axis in range(3):
        w = np.zeros(3)
        w[axis] = np.pi
        R = G.so3_exp_matrix(jnp.asarray(w, jnp.float32))
        q = G.rotmat_to_quat(R)
        R2 = G.quat_to_rotmat(q)
        np.testing.assert_allclose(R2, R, atol=1e-5)


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(3)
    w = rng.normal(size=(64, 3))
    w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(0.01, 3.0, size=(64, 1))
    w = jnp.asarray(w, jnp.float32)
    np.testing.assert_allclose(G.so3_log(G.so3_exp_quat(w)), w, atol=1e-4)
    # tiny angles
    wt = jnp.asarray(rng.normal(size=(8, 3)) * 1e-6, jnp.float32)
    np.testing.assert_allclose(G.so3_log(G.so3_exp_quat(wt)), wt, atol=1e-8)


def test_right_jacobian_finite_difference():
    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.normal(size=3), jnp.float64).astype(jnp.float32)
    Jr = G.so3_right_jacobian(w)
    eps = 1e-3
    # exp(w + Jr^-1... ) check: exp(w)exp(Jr d) ~ exp(w + d)
    for k in range(3):
        d = np.zeros(3, np.float32)
        d[k] = eps
        lhs = G.quat_to_rotmat(G.so3_exp_quat(w + jnp.asarray(d)))
        rhs = G.quat_to_rotmat(
            G.quat_mul(G.so3_exp_quat(w), G.so3_exp_quat(Jr @ jnp.asarray(d)))
        )
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def test_right_jacobian_inverse():
    rng = np.random.default_rng(5)
    w = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    J = G.so3_right_jacobian(w)
    Ji = G.so3_right_jacobian_inv(w)
    eye = jnp.broadcast_to(jnp.eye(3), (8, 3, 3))
    np.testing.assert_allclose(J @ Ji, eye, atol=1e-5)


def test_pose_compose_inverse():
    rng = np.random.default_rng(6)
    q = random_quats(rng, 8)
    t = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    qi, ti = G.pose_inverse(q, t)
    qc, tc = G.pose_compose(q, t, qi, ti)
    np.testing.assert_allclose(np.abs(np.asarray(qc[:, 0])), 1.0, atol=1e-5)
    np.testing.assert_allclose(tc, 0.0, atol=1e-5)


def test_pose_apply_center():
    rng = np.random.default_rng(7)
    q = random_quats(rng, 8)
    t = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    c = G.pose_center(q, t)
    # camera center maps to origin
    np.testing.assert_allclose(G.pose_apply(q, t, c), 0.0, atol=1e-5)


def test_pose_retract_zero_is_identity():
    rng = np.random.default_rng(8)
    q = random_quats(rng, 4)
    t = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    q2, t2 = G.pose_retract(q, t, jnp.zeros((4, 6)))
    np.testing.assert_allclose(np.abs(np.sum(q * q2, axis=-1)), 1.0, atol=1e-6)
    np.testing.assert_allclose(t2, t, atol=1e-6)


def test_numpy_twins_match_jnp():
    """Host-side numpy twins must agree with the jnp geometry exactly
    (they replace per-call device math in the mapper's bookkeeping)."""
    import numpy as np
    import jax.numpy as jnp
    from xrsfm_tpu.utils import geometry as G

    rng = np.random.default_rng(11)
    q = rng.normal(size=(5, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    t = rng.normal(size=(5, 3))
    q2 = rng.normal(size=(5, 4))
    q2 /= np.linalg.norm(q2, axis=1, keepdims=True)
    t2 = rng.normal(size=(5, 3))
    f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
    np.testing.assert_allclose(
        G.quat_to_rotmat_np(q), np.asarray(G.quat_to_rotmat(f32(q))),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        G.pose_center_np(q, t), np.asarray(G.pose_center(f32(q), f32(t))),
        atol=1e-5,
    )
    qr_np, tr_np = G.pose_relative_np(q, t, q2, t2)
    qr, tr = G.pose_relative(f32(q), f32(t), f32(q2), f32(t2))
    np.testing.assert_allclose(qr_np, np.asarray(qr), atol=1e-5)
    np.testing.assert_allclose(tr_np, np.asarray(tr), atol=1e-5)
    qc_np, tc_np = G.pose_compose_np(q, t, q2, t2)
    qc, tc = G.pose_compose(f32(q), f32(t), f32(q2), f32(t2))
    np.testing.assert_allclose(qc_np, np.asarray(qc), atol=1e-5)
    np.testing.assert_allclose(tc_np, np.asarray(tc), atol=1e-5)
