"""AprilTag detection + metric scale estimation.

(reference: src/tag/tag_extract.hpp:33-277 + src/estimate_scale.cc —
apriltag C library detection, RANSAC corner triangulation
(CreatePoint3dRAW), then two Ceres solves: per-tag similarity pose +
global scale against the canonical tag square (TagCost,
cost_factor_ceres.h:223-260), and a joint refine with projection
residuals; finally all poses/points are divided by the scale.)

Host-side detection uses cv2.aruco's AprilTag 36h11 dictionary (the
reference also treats detection as host CPU preprocessing — SURVEY.md
§2.8); corner triangulation and the scale solve run on device.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ..base.map import SfMMap
from ..ops.umeyama import umeyama


def canonical_corners(tag_length: float) -> np.ndarray:
    """Corner layout of a tag of side `tag_length`, centered at origin,
    in detection corner order (cv2.aruco: TL, TR, BR, BL)."""
    h = tag_length / 2.0
    return np.array(
        [[-h, h, 0.0], [h, h, 0.0], [h, -h, 0.0], [-h, -h, 0.0]], np.float64
    )


def detect_tags(image) -> Dict[int, np.ndarray]:
    """Detect AprilTag 36h11 markers.  Returns tag_id -> [4, 2] pixel
    corners (reference: tag_extract, tag_extract.hpp:33-57)."""
    import cv2

    img = np.asarray(image)
    if img.ndim == 3:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    d = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_APRILTAG_36h11)
    det = cv2.aruco.ArucoDetector(d, cv2.aruco.DetectorParameters())
    corners, ids, _ = det.detectMarkers(img)
    out = {}
    if ids is not None:
        for c, i in zip(corners, ids.flatten()):
            out[int(i)] = c.reshape(4, 2).astype(np.float64)
    return out


def triangulate_tag_corners(
    m: SfMMap,
    detections: Dict[int, Dict[int, np.ndarray]],
    th_px: float = 8.0,
) -> Dict[int, np.ndarray]:
    """detections: frame_id -> {tag_id -> [4,2] pixels}.

    Triangulates each observed tag corner from all registered frames
    seeing it (reference: CreatePoint3dRAW, track_processor.cc:682-730).
    Returns tag_id -> [4, 3] triangulated corners (NaN rows when a corner
    could not be triangulated)."""
    import jax.numpy as jnp

    from ..mapper import kernels
    from ..utils import camera as Cam

    # group observations per (tag, corner)
    obs: Dict[Tuple[int, int], List[Tuple[int, np.ndarray]]] = {}
    for fid, tags in detections.items():
        if not m.registered[fid]:
            continue
        for tag_id, corners in tags.items():
            for k in range(4):
                obs.setdefault((tag_id, k), []).append((fid, corners[k]))

    keys = [k for k, v in obs.items() if len(v) >= 2]
    if not keys:
        return {}
    V = max(len(obs[k]) for k in keys)
    V = min(max(V, 2), 16)
    B = kernels.bucket(len(keys), lo=8)
    q = np.zeros((B, V, 4), np.float32)
    q[..., 0] = 1.0
    t = np.zeros((B, V, 3), np.float32)
    uv = np.zeros((B, V, 2), np.float32)
    mask = np.zeros((B, V), bool)
    for i, key in enumerate(keys):
        for j, (fid, px) in enumerate(obs[key][:V]):
            params = jnp.asarray(m.cameras[int(m.cam_of_frame[fid])], jnp.float32)
            uvn = np.asarray(Cam.image_to_normalized(params, jnp.asarray(px, jnp.float32)))
            q[i, j] = m.q[fid]
            t[i, j] = m.t[fid]
            uv[i, j] = uvn
            mask[i, j] = True
    focal = float(next(iter(m.cameras.values()))[0])
    xyz, obs_ok, ok, ang = kernels.robust_triangulate(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(uv), jnp.asarray(mask),
        (th_px / focal) ** 2, 0.0,
    )
    xyz = np.asarray(xyz)
    ok = np.asarray(ok)
    out: Dict[int, np.ndarray] = {}
    for i, (tag_id, k) in enumerate(keys):
        if tag_id not in out:
            out[tag_id] = np.full((4, 3), np.nan)
        if ok[i]:
            out[tag_id][k] = xyz[i]
    return out


def estimate_scale_from_corners(
    tag_corners: Dict[int, np.ndarray], tag_length: float
) -> Tuple[float, Dict[int, Tuple[np.ndarray, np.ndarray]]]:
    """Fit per-tag similarity transforms of the canonical square to the
    triangulated corners; the shared scale s maps meters -> reconstruction
    units.  Returns (s, {tag_id: (R, t)}).

    (reference solves this jointly with Ceres, tag_extract.hpp:199-234;
    with all four corners triangulated the per-tag Umeyama fit is the
    closed-form least squares of the same residual.)"""
    canon = canonical_corners(tag_length)
    scales = []
    poses = {}
    for tag_id, corners in tag_corners.items():
        good = ~np.isnan(corners[:, 0])
        if good.sum() < 3:
            continue
        s, R, t = umeyama(canon[good], corners[good], with_scale=True)
        if s <= 0:
            continue
        scales.append(s)
        poses[tag_id] = (R, t)
    if not scales:
        return 0.0, {}
    return float(np.median(scales)), poses


def apply_metric_scale(m: SfMMap, scale: float):
    """Divide all translations and points by the scale so one unit = one
    meter (reference: tag_extract.hpp:269-276)."""
    m.t /= scale
    m.track_xyz[: m.num_tracks] /= scale
