import numpy as np
import pytest

from xrsfm_tpu.feature import tags as T


def test_detect_generated_apriltag():
    import cv2

    d = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_APRILTAG_36h11)
    marker = cv2.aruco.generateImageMarker(d, 17, 120)
    img = np.full((400, 400), 255, np.uint8)
    img[140:260, 140:260] = marker
    found = T.detect_tags(img)
    assert 17 in found
    corners = found[17]
    assert corners.shape == (4, 2)
    # corners should frame the marker area
    assert corners[:, 0].min() > 130 and corners[:, 0].max() < 270


def test_scale_from_synthetic_corners():
    # canonical 0.113 m tag placed in a reconstruction at scale 3.7
    rng = np.random.default_rng(0)
    scale_gt = 3.7
    canon = T.canonical_corners(0.113)
    tag_corners = {}
    for tag_id in range(3):
        # random rigid placement
        w = rng.normal(size=3)
        w /= np.linalg.norm(w)
        ang = rng.uniform(0.1, 1.0)
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        R = np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * K @ K
        t = rng.uniform(-2, 2, 3)
        tag_corners[tag_id] = scale_gt * (canon @ R.T + t)
    s, poses = T.estimate_scale_from_corners(tag_corners, 0.113)
    assert abs(s - scale_gt) / scale_gt < 1e-5
    assert len(poses) == 3


def test_scale_with_missing_corner():
    scale_gt = 2.0
    canon = T.canonical_corners(0.113)
    corners = scale_gt * canon.copy()
    corners[3] = np.nan  # one corner failed to triangulate
    s, _ = T.estimate_scale_from_corners({0: corners}, 0.113)
    assert abs(s - scale_gt) / scale_gt < 1e-5


def test_joint_refine_scale_beats_closed_form():
    """VERDICT r1 task 10 done-criterion: under corner-triangulation
    noise, the joint pass (reprojection residuals + rigid tag shape,
    reference tag_extract.hpp:237-265) recovers metric scale to <0.5%
    where the closed-form per-tag fit drifts."""
    import jax.numpy as jnp

    from xrsfm_tpu.base.map import SfMMap
    from xrsfm_tpu.utils import geometry as G

    rng = np.random.default_rng(1)
    scale_gt = 3.1
    tag_len = 0.113
    canon = T.canonical_corners(tag_len)
    # two tags on a wall (z = 4), world = scale_gt * meters
    tag_world = {}
    tag_poses_gt = {}
    for tag_id, cx in [(0, -0.5), (1, 0.6)]:
        R = np.eye(3)
        t = np.array([cx, 0.1 * tag_id, 4.0])
        tag_world[tag_id] = scale_gt * (canon @ R.T + t)
        tag_poses_gt[tag_id] = (R, t * scale_gt)

    # a ring of 12 registered cameras looking at the wall
    m = SfMMap()
    m.add_camera(0, 1, [500.0, 500.0, 320.0, 240.0], 640, 480)
    detections = {}
    f = 500.0
    for i in range(12):
        c = scale_gt * np.array(
            [0.8 * np.sin(i * 0.5), 0.4 * np.cos(i * 0.7), -0.2 * (i % 3)]
        )
        Rw = np.eye(3)
        q = G.rotmat_to_quat_np(Rw)
        t = -Rw @ c
        fid = m.add_frame(f"im{i}.png", 0, np.zeros((1, 2), np.float32))
        m.q[fid] = q
        m.t[fid] = t
        m.registered[fid] = True
        dets = {}
        for tag_id, cw in tag_world.items():
            pc = cw @ Rw.T + t
            uv = pc[:, :2] / pc[:, 2:3]
            px = uv * f + np.array([320.0, 240.0])
            px += rng.normal(scale=0.3, size=px.shape)  # detection noise
            dets[tag_id] = px
        detections[fid] = dets

    # noisy triangulated corners (the closed-form fit sees only these)
    corners_noisy = {
        tid: cw + rng.normal(scale=0.01 * scale_gt, size=cw.shape)
        for tid, cw in tag_world.items()
    }
    s_cf, poses_cf = T.estimate_scale_from_corners(corners_noisy, tag_len)
    err_cf = abs(s_cf - scale_gt) / scale_gt
    s_joint = T.joint_refine_scale(
        m, detections, corners_noisy, s_cf, poses_cf, tag_len
    )
    err_joint = abs(s_joint - scale_gt) / scale_gt
    assert err_joint < 5e-3, (s_joint, scale_gt, err_joint)
    assert err_joint < err_cf + 1e-6, (err_joint, err_cf)
