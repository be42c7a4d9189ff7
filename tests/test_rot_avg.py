"""Rotation averaging polish (optim/rot_avg.py).

The reference has no rotation-averaging stage (its pose graph is
translation+scale only, ba_solver.cc:147-328); this is the drift-basin
polish that lets long circuits converge below the BA basin floor."""

import numpy as np

from xrsfm_tpu.optim import rot_avg
from xrsfm_tpu.utils import geometry as G


def _rand_quat(rng, scale=1.0):
    w = rng.normal(size=3) * scale
    return np.asarray(G.so3_exp_quat(w.astype(np.float32)))


def _make_problem(rng, n=80, drift_per_step_deg=0.5, noise_deg=0.1):
    """Chain of rotations with accumulated drift in the initialization;
    measurements are near-exact relative rotations."""
    q_gt = np.zeros((n, 4), np.float32)
    q_gt[0] = [1, 0, 0, 0]
    for i in range(1, n):
        step = _rand_quat(rng, 0.05)
        q_gt[i] = G.quat_mul_np(step, q_gt[i - 1]).astype(np.float32)
    # drifted init: accumulate a consistent small bias (like a mapper arm)
    bias = G.so3_exp_quat(
        np.deg2rad(drift_per_step_deg)
        * np.array([0.3, 1.0, 0.1], np.float32)
        / np.linalg.norm([0.3, 1.0, 0.1])
    )
    q0 = q_gt.copy()
    for i in range(1, n):
        rel = G.quat_mul_np(q_gt[i], rot_avg._quat_conj_np(q_gt[i - 1]))
        rel = G.quat_mul_np(np.asarray(bias), rel)
        q0[i] = G.quat_mul_np(rel, q0[i - 1]).astype(np.float32)
    ei, ej, qm, w = [], [], [], []
    for i in range(n):
        for dj in (1, 2, 3):
            j = i + dj
            if j >= n:
                continue
            ei.append(i)
            ej.append(j)
            noise = _rand_quat(rng, np.deg2rad(noise_deg))
            qm.append(
                G.quat_mul_np(
                    np.asarray(noise),
                    G.quat_mul_np(q_gt[j], rot_avg._quat_conj_np(q_gt[i])),
                ).astype(np.float32)
            )
            w.append(10.0)
    # loop edges tying the two ends together (what exposes the drift)
    for i in range(3):
        ei.append(i)
        ej.append(n - 1 - i)
        qm.append(
            G.quat_mul_np(
                q_gt[n - 1 - i], rot_avg._quat_conj_np(q_gt[i])
            ).astype(np.float32)
        )
        w.append(10.0)
    return (q_gt, q0, np.asarray(ei, np.int32), np.asarray(ej, np.int32),
            np.stack(qm).astype(np.float32), np.asarray(w, np.float32))


def _gauge_aligned_err_deg(q_est, q_gt):
    """Max angular error after removing the global gauge rotation."""
    # align on frame 0
    g = G.quat_mul_np(q_gt[0], rot_avg._quat_conj_np(q_est[0]))
    errs = []
    for k in range(len(q_gt)):
        qa = G.quat_mul_np(np.asarray(g), q_est[k])
        d = G.quat_mul_np(qa, rot_avg._quat_conj_np(q_gt[k]))
        errs.append(np.rad2deg(rot_avg._quat_angle_np(d)))
    return float(np.max(errs))


def test_solver_recovers_drifted_chain():
    rng = np.random.default_rng(0)
    q_gt, q0, ei, ej, qm, w = _make_problem(rng, n=80)
    # the drifted init is off by tens of degrees at the far end
    assert _gauge_aligned_err_deg(q0, q_gt) > 10.0
    q_est, med = rot_avg.solve_rotation_averaging(q0, ei, ej, qm, w)
    assert _gauge_aligned_err_deg(q_est, q_gt) < 0.5
    assert np.rad2deg(med) < 0.5


def test_solver_robust_to_outlier_edges():
    rng = np.random.default_rng(1)
    q_gt, q0, ei, ej, qm, w = _make_problem(rng, n=60)
    # corrupt 10% of the edges with gross rotations
    bad = rng.choice(len(ei), size=len(ei) // 10, replace=False)
    for b in bad:
        qm[b] = _rand_quat(rng, 1.5)
    q_est, _ = rot_avg.solve_rotation_averaging(q0, ei, ej, qm, w)
    assert _gauge_aligned_err_deg(q_est, q_gt) < 1.5


def test_measurement_matches_ground_truth_rotation():
    """8pt + cheirality on synthetic projections recovers R_ij."""
    rng = np.random.default_rng(2)
    X = rng.uniform(-2, 2, size=(200, 3))
    X[:, 2] += 6.0
    q1 = np.array([1, 0, 0, 0], np.float32)
    t1 = np.zeros(3, np.float32)
    q2 = _rand_quat(rng, 0.1).astype(np.float32)
    t2 = np.array([0.8, -0.2, 0.1], np.float32)
    x1 = X[:, :2] / X[:, 2:3]
    Xc2 = (G.quat_to_rotmat_np(q2) @ X.T).T + t2
    x2 = Xc2[:, :2] / Xc2[:, 2:3]
    uv1 = np.zeros((1, 256, 2), np.float32)
    uv2 = np.zeros((1, 256, 2), np.float32)
    mask = np.zeros((1, 256), bool)
    uv1[0, :200] = x1
    uv2[0, :200] = x2
    mask[0, :200] = True
    import jax

    keys = jax.vmap(jax.random.PRNGKey)(np.arange(1))
    q_meas, _t_meas, sup, _par = rot_avg._measure_batch(
        keys, uv1, uv2, mask, np.full(1, (2.0 / 500.0) ** 2, np.float32)
    )
    q_meas = np.asarray(q_meas[0])
    assert float(sup[0]) > 150
    d = G.quat_mul_np(q_meas, rot_avg._quat_conj_np(q2))
    assert np.rad2deg(rot_avg._quat_angle_np(d)) < 0.2


def test_polish_skips_on_disconnected_graph():
    class FakeMap:
        pass

    m = FakeMap()
    m.num_frames = 12
    m.registered = np.ones(12, bool)
    m.pairs = []
    m.q = np.tile(np.array([1.0, 0, 0, 0]), (12, 1))
    m.t = np.zeros((12, 3))
    m.kps_norm = [np.zeros((0, 2), np.float32)] * 12
    assert rot_avg.rotation_averaging_polish(m) is False
