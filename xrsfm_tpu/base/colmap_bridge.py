"""SfMMap <-> COLMAP-format conversion.

(reference: WriteColMapDataBinary / ReadColMapDataBinary,
src/utility/io_ecim.cc:86-301)
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from .map import SfMMap
from ..utils import geometry as G
from ..utils import io_colmap as IO


def map_to_colmap(m: SfMMap, out_dir: str):
    """Write cameras.bin / images.bin / points3D.bin for the registered
    portion of the map."""
    os.makedirs(out_dir, exist_ok=True)
    cams: Dict[int, IO.ColmapCamera] = {}
    for cid, (model_id, raw, w, h) in m.camera_models.items():
        cams[cid] = IO.ColmapCamera(cid, model_id, w, h, np.asarray(raw))
    imgs: Dict[int, IO.ColmapImage] = {}
    for f in range(m.num_frames):
        if not m.registered[f]:
            continue
        tid = m.track_of[f].astype(np.int64).copy()
        tid[tid >= 0] = np.where(
            m.track_valid[tid[tid >= 0]], tid[tid >= 0], -1
        )
        imgs[f + 1] = IO.ColmapImage(
            image_id=f + 1,
            qvec=np.asarray(m.q[f], np.float64),
            tvec=np.asarray(m.t[f], np.float64),
            camera_id=int(m.cam_of_frame[f]),
            name=m.names[f],
            xys=np.asarray(m.kps[f], np.float64),
            point3D_ids=tid,
        )
    pts: Dict[int, IO.ColmapPoint3D] = {}
    for t in np.nonzero(m.track_valid[: m.num_tracks])[0]:
        obs = m.track_obs[int(t)]
        if not obs:
            continue
        pts[int(t)] = IO.ColmapPoint3D(
            point3D_id=int(t),
            xyz=np.asarray(m.track_xyz[t], np.float64),
            rgb=np.array([128, 128, 128], np.uint8),
            error=float(m.track_error[t]),
            image_ids=np.asarray([f + 1 for f in obs], np.int32),
            point2D_idxs=np.asarray(list(obs.values()), np.int32),
        )
    IO.write_cameras_bin(os.path.join(out_dir, "cameras.bin"), cams)
    IO.write_images_bin(os.path.join(out_dir, "images.bin"), imgs)
    IO.write_points3d_bin(os.path.join(out_dir, "points3D.bin"), pts)
    return len(imgs), len(pts)


def colmap_to_map(model_dir: str) -> SfMMap:
    """Load a COLMAP binary model into an SfMMap (poses + keypoints +
    tracks; no matches/corr graph)."""
    cams = IO.read_cameras_bin(os.path.join(model_dir, "cameras.bin"))
    imgs = IO.read_images_bin(os.path.join(model_dir, "images.bin"))
    pts = IO.read_points3d_bin(os.path.join(model_dir, "points3D.bin"))
    m = SfMMap()
    for cid, c in cams.items():
        m.add_camera(cid, c.model_id, c.params, c.width, c.height)
    id_map = {}
    for iid in sorted(imgs):
        im = imgs[iid]
        f = m.add_frame(im.name, im.camera_id, im.xys.astype(np.float32))
        id_map[iid] = f
        m.q[f] = im.qvec
        m.t[f] = im.tvec
        m.registered[f] = True
    # build tracks (add_observation also maintains the flat COO
    # observation table that the BA glue consumes)
    for pid in sorted(pts):
        p = pts[pid]
        tid = m.new_track(p.xyz)
        m.track_error[tid] = p.error
        for iid, p2d in zip(p.image_ids, p.point2D_idxs):
            m.add_observation(tid, id_map[int(iid)], int(p2d))
    m.rebuild_visibility_counters()
    return m


def write_trajectory(m: SfMMap, path: str, timestamps=None):
    """TUM trajectory of registered frames (reference: WriteTrajectory,
    io_ecim.hpp:108-122).  Host-side numpy in float64 (the device only
    has float32; trajectory files deserve full precision)."""
    q = np.asarray(m.q, np.float64)  # (w, x, y, z) Tcw
    t = np.asarray(m.t, np.float64)
    qwc = q * np.array([1.0, -1.0, -1.0, -1.0])
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = np.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    ).reshape(-1, 3, 3)
    twc = -np.einsum("fji,fj->fi", R, t)  # camera center = -R^T t
    stamps = timestamps if timestamps is not None else m.names
    IO.write_trajectory_tum(path, list(stamps), qwc, twc, m.registered)
