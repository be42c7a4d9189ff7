"""Reconstruction stage pipeline (reference: src/run_reconstruction.cc).

Usage: python -m xrsfm_tpu.cli run_reconstruction <bin_dir> <camera_txt>
       <output_dir> [--init_id1 N] [--init_id2 N]

Reads ftr.bin + fp.bin + a single-camera cameras.txt, runs the incremental
mapper, writes COLMAP binaries.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

from ..base.colmap_bridge import map_to_colmap, write_trajectory
from ..base.map import SfMMap
from ..mapper import IncrementalMapper, MapperOptions
from ..utils import io_colmap as IOC
from ..utils import native


def build_map(
    bin_dir: str,
    camera_txt: Optional[str] = None,
    camera_per_image: Optional[dict] = None,
    name2cid: Optional[dict] = None,
) -> SfMMap:
    """PreProcess equivalent (reference: run_reconstruction.cc:12-47):
    load features + verified pairs, build the correspondence graph."""
    feats = native.read_features_fast(os.path.join(bin_dir, "ftr.bin"), with_descs=False)
    pairs = native.read_frame_pairs_fast(os.path.join(bin_dir, "fp.bin"))
    m = SfMMap()
    if camera_per_image is None:
        cams = IOC.read_cameras_text(camera_txt)
        cid0 = sorted(cams.keys())[0]
        c = cams[cid0]
        m.add_camera(0, c.model_id, c.params, c.width, c.height)
        for f in feats:
            m.add_frame(f.name, 0, f.keypoints[:, :2])
    else:
        for cid, c in camera_per_image.items():
            m.add_camera(cid, c.model_id, c.params, c.width, c.height)
        for f in feats:
            cid = name2cid.get(f.name, -1)
            if cid < 0:
                cid = 0
            m.add_frame(f.name, cid, f.keypoints[:, :2])
    for p in pairs:
        inl = p.inlier_matches()
        if len(inl):
            m.add_pair(p.id1, p.id2, inl)
    m.build_correspondence_graph()
    return m


def main(
    bin_dir: str,
    camera_txt: str,
    output_dir: str,
    init_id1: int = -1,
    init_id2: int = -1,
    opts: Optional[MapperOptions] = None,
    correct_pose: bool = False,
    snapshot_every: int = 0,
    resume: bool = False,
    n_devices: int = 1,
):
    t0 = time.time()
    m = build_map(bin_dir, camera_txt)
    opts = opts or MapperOptions()
    opts.init_id1 = init_id1
    opts.init_id2 = init_id2
    opts.correct_pose = opts.correct_pose or correct_pose
    # drift-prone sequential regime: couple the global pose polish to
    # correct_pose (guarded internally by connectivity/residual gates)
    opts.global_polish = opts.global_polish or opts.correct_pose
    if n_devices > 1:
        opts.n_devices = n_devices
    snap_path = os.path.join(output_dir, "snapshot.npz")
    if snapshot_every:
        opts.snapshot_every = snapshot_every
        opts.snapshot_path = snap_path
    if resume and os.path.exists(snap_path):
        from ..base import snapshot as SNAP

        SNAP.restore_into(m, snap_path)
        print(
            f"[reconstruction] resumed from {snap_path} "
            f"({int(np.count_nonzero(m.registered))} frames registered)",
            flush=True,
        )
    mapper = IncrementalMapper(opts)
    ok = mapper.reconstruct(m)
    if not ok:
        print("[reconstruction] FAILED to initialize", flush=True)
        return None
    n_img, n_pts = map_to_colmap(m, output_dir)
    write_trajectory(m, os.path.join(output_dir, "trajectory.txt"))
    print(
        f"[reconstruction] {n_img} images, {n_pts} points in "
        f"{time.time() - t0:.1f}s -> {output_dir}",
        flush=True,
    )
    return m
