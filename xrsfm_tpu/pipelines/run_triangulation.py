"""Triangulation with known poses (reference: src/run_triangulation.cc).

Usage: python -m xrsfm_tpu.cli run_triangulation <bin_dir> <model_dir>
       <output_dir>

Loads known poses from a COLMAP model (images.bin), features + verified
pairs from bin_dir, triangulates all frames, runs point-only GBA
(all poses fixed), writes the resulting COLMAP model.
"""

from __future__ import annotations

import os
import time

import numpy as np

from ..base.colmap_bridge import map_to_colmap
from ..base.map import SfMMap
from ..mapper import ba_glue, triangulate
from ..optim.ba import BAOptions
from ..utils import io_colmap as IOC
from ..utils import native


def main(bin_dir: str, model_dir: str, output_dir: str, tri_px: float = 8.0):
    t0 = time.time()
    feats = native.read_features_fast(os.path.join(bin_dir, "ftr.bin"), with_descs=False)
    pairs = native.read_frame_pairs_fast(os.path.join(bin_dir, "fp.bin"))
    cams = IOC.read_cameras_bin(os.path.join(model_dir, "cameras.bin"))
    imgs = IOC.read_images_bin(os.path.join(model_dir, "images.bin"))
    name_to_pose = {im.name: (im.qvec, im.tvec, im.camera_id) for im in imgs.values()}

    m = SfMMap()
    for cid, c in cams.items():
        m.add_camera(cid, c.model_id, c.params, c.width, c.height)
    default_cid = sorted(cams.keys())[0]
    for f in feats:
        pose = name_to_pose.get(f.name)
        cid = pose[2] if pose else default_cid
        fid = m.add_frame(f.name, cid, f.keypoints[:, :2])
        if pose is not None:
            m.q[fid] = pose[0]
            m.t[fid] = pose[1]
            m.registered[fid] = True
    for p in pairs:
        inl = p.inlier_matches()
        if len(inl):
            m.add_pair(p.id1, p.id2, inl)
    m.build_correspondence_graph()

    topts = triangulate.TriOptions(tri_px=tri_px)
    for fid in range(m.num_frames):
        if m.registered[fid]:
            triangulate.triangulate_frame(m, fid, topts)
    for fid in range(m.num_frames):
        if m.registered[fid]:
            triangulate.merge_frame_tracks(m, fid, topts)
    triangulate.filter_tracks(m, None, topts)

    # point-only global BA: all poses fixed
    # (reference: GBA with fix_all_frames=true, run_triangulation.cc:180)
    reg = list(np.nonzero(m.registered)[0])
    ba_glue.run_ba(m, reg, BAOptions(max_iters=30, huber_px=4.0),
                   fix_all_poses=True)
    triangulate.filter_tracks(m, None, topts)

    n_img, n_pts = map_to_colmap(m, output_dir)
    print(
        f"[triangulation] {n_img} images, {n_pts} points in "
        f"{time.time() - t0:.1f}s -> {output_dir}",
        flush=True,
    )
    return m
