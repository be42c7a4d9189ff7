"""Global pose polish (optim/global_pose.py): translation recovery."""

import numpy as np

from xrsfm_tpu.optim import global_pose


def test_translation_averaging_recovers_warped_circuit():
    """A smoothly warped square circuit (the BA drift-basin shape) must
    be pulled back to the true centers by the per-edge-scale robust
    solve, given near-exact measured directions."""
    rng = np.random.default_rng(0)
    n = 80
    seg = n // 4
    dirs = np.array([[1, 0, 0], [0, 0, 1], [-1, 0, 0], [0, 0, -1]], float)
    c_gt = np.zeros((n, 3))
    for i in range(1, n):
        c_gt[i] = c_gt[i - 1] + dirs[min((i - 1) // seg, 3)]
    # drifted init: accumulated scale warp + lateral bend (2-3% of span)
    c0 = np.zeros((n, 3))
    for i in range(1, n):
        step = c_gt[i] - c_gt[i - 1]
        s = 1.0 + 0.0015 * i
        bend = 0.01 * np.array([0.2, 0.0, 1.0]) * (i / n)
        c0[i] = c0[i - 1] + s * step + bend
    span = np.linalg.norm(c_gt.max(0) - c_gt.min(0))
    drift0 = np.linalg.norm(c0 - c_gt, axis=1).max() / span
    assert drift0 > 0.015  # the init really is drifted

    ei, ej, d, s_init = [], [], [], []
    for i in range(n):
        for dj in (1, 2, 3, 4):
            j = i + dj
            if j >= n:
                continue
            v = c_gt[j] - c_gt[i]
            v = v / np.linalg.norm(v)
            v = v + rng.normal(scale=0.004, size=3)  # ~0.25 deg noise
            ei.append(i)
            ej.append(j)
            d.append(v / np.linalg.norm(v))
            s_init.append(np.linalg.norm(c0[j] - c0[i]))
    # loop-closure edges across the circuit
    for i in range(0, seg, 4):
        j = n - 1 - i
        v = c_gt[j] - c_gt[i]
        nv = np.linalg.norm(v)
        if nv < 1e-9:
            continue
        ei.append(i)
        ej.append(j)
        d.append(v / nv)
        s_init.append(np.linalg.norm(c0[j] - c0[i]))
    ei = np.asarray(ei, np.int32)
    ej = np.asarray(ej, np.int32)
    d = np.asarray(d)
    s_init = np.asarray(s_init)
    w = np.ones(len(ei))

    c_new, med = global_pose.solve_translation_averaging(
        c0, ei, ej, d, s_init, w
    )
    from xrsfm_tpu.ops.umeyama import ate_rmse

    ate0 = ate_rmse(c_gt, c0) / span
    ate1 = ate_rmse(c_gt, c_new) / span
    assert ate1 < 0.5 * ate0, (ate0, ate1)
    assert ate1 < 0.01, ate1


def test_translation_averaging_robust_to_outlier_edges():
    """A few grossly wrong directions must be IRLS-rejected."""
    rng = np.random.default_rng(1)
    n = 40
    c_gt = np.cumsum(rng.normal(size=(n, 3)), axis=0)
    ei, ej, d, s_init = [], [], [], []
    for i in range(n):
        for dj in (1, 2, 3):
            j = i + dj
            if j >= n:
                continue
            v = c_gt[j] - c_gt[i]
            v = v / np.linalg.norm(v)
            ei.append(i)
            ej.append(j)
            d.append(v)
            s_init.append(np.linalg.norm(c_gt[j] - c_gt[i]))
    d = np.asarray(d)
    bad = rng.choice(len(d), len(d) // 10, replace=False)
    d[bad] = rng.normal(size=(len(bad), 3))
    d[bad] /= np.linalg.norm(d[bad], axis=1, keepdims=True)
    c0 = c_gt + rng.normal(scale=0.05, size=c_gt.shape)
    c_new, _ = global_pose.solve_translation_averaging(
        c0, np.asarray(ei, np.int32), np.asarray(ej, np.int32), d,
        np.asarray(s_init), np.ones(len(d)),
    )
    from xrsfm_tpu.ops.umeyama import ate_rmse

    span = np.linalg.norm(c_gt.max(0) - c_gt.min(0))
    assert ate_rmse(c_gt, c_new) / span < 0.01
