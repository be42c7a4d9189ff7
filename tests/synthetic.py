"""Shared synthetic-scene generators for geometry tests.

The reference ships no unit tests (SURVEY.md §4); our test strategy is
synthetic ground truth: random camera rigs looking at a bounded point cloud,
exact projections, controlled noise/outliers.
"""

import numpy as np


def look_at(center, target, up=(0, 1e-4, 1.0)):
    """Rotation R (world->cam rows) for a camera at `center` looking at
    `target`; z forward, COLMAP-style (x right, y down, z forward)."""
    z = np.asarray(target, np.float64) - np.asarray(center, np.float64)
    z = z / np.linalg.norm(z)
    up = np.asarray(up, np.float64)
    x = np.cross(-up, z)
    if np.linalg.norm(x) < 1e-9:
        x = np.array([1.0, 0, 0])
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z], axis=0)


def rotmat_to_quat_np(R):
    w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    if w > 1e-6:
        x = (R[2, 1] - R[1, 2]) / (4 * w)
        y = (R[0, 2] - R[2, 0]) / (4 * w)
        z = (R[1, 0] - R[0, 1]) / (4 * w)
    else:  # fall back for 180-degree rotations
        x, yv, z = np.sqrt(np.maximum(0, (1 + np.diag(R) * 2 - np.trace(R)) / 4))
        y = yv
    q = np.array([w, x, y, z])
    return q / np.linalg.norm(q)


def make_scene(
    n_cams=4,
    n_pts=200,
    radius=4.0,
    noise=0.0,
    seed=0,
    spread=2.0,
):
    """Cameras on an arc looking at origin; points in a box around origin.

    Returns dict with q [C,4], t [C,3] (Tcw), xyz [P,3], uv [C,P,2]
    (noiseless normalized projections + optional gaussian noise), depth
    [C,P].
    """
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-spread / 2, spread / 2, size=(n_pts, 3))
    qs, ts, uvs, zs = [], [], [], []
    for i in range(n_cams):
        ang = (i / max(n_cams - 1, 1) - 0.5) * 1.2
        center = np.array(
            [radius * np.sin(ang), 0.3 * rng.normal(), -radius * np.cos(ang)]
        )
        R = look_at(center, np.zeros(3))
        t = -R @ center
        pc = xyz @ R.T + t
        uv = pc[:, :2] / pc[:, 2:3]
        if noise > 0:
            uv = uv + rng.normal(scale=noise, size=uv.shape)
        qs.append(rotmat_to_quat_np(R))
        ts.append(t)
        uvs.append(uv)
        zs.append(pc[:, 2])
    return dict(
        q=np.asarray(qs, np.float32),
        t=np.asarray(ts, np.float32),
        xyz=np.asarray(xyz, np.float32),
        uv=np.asarray(uvs, np.float32),
        depth=np.asarray(zs, np.float32),
    )
