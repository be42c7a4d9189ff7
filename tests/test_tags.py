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
