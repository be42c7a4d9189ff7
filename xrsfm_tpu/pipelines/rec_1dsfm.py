"""1DSfM unordered-scene reconstruction (reference: src/rec_1dsfm.cc:14-98).

Per-image SIMPLE_RADIAL cameras from camera_info.txt; cameras with zero
distortion are marked invalid in the reference (rec_1dsfm.cc:46-55) — here
frames without a camera entry get a default camera and still participate.
"""

from __future__ import annotations

import time

from ..base.colmap_bridge import map_to_colmap
from ..mapper import IncrementalMapper, MapperOptions
from ..utils import io_colmap as IOC
from . import run_reconstruction as RR


def main(bin_dir: str, camera_info_path: str, output_dir: str,
         n_devices: int = 1):
    t0 = time.time()
    name2cid, cams = IOC.read_camera_info(camera_info_path)
    m = RR.build_map(
        bin_dir, camera_per_image=cams, name2cid=name2cid
    )
    opts = MapperOptions()
    # reference: th_rpe_gba = 4px for internet scenes (rec_1dsfm.cc:88) —
    # that is the GBA-time threshold, which here is the final-polish gate
    # (polish_px, default 4).  The GROWTH-time filter keeps the default
    # 16px: until the per-image intrinsics are refined, genuine tracks
    # reproject several px off, and filtering them at 4px starves the
    # registration frontier (measured: 43/80 plaza frames, unregistered
    # rest had ZERO map correspondences left).
    opts.tri.polish_px = 4.0
    # per-image EXIF focals are noisy and distortion starts at 0
    # (reference rec_1dsfm.cc:46-55); GBA refines camera_param
    opts.refine_intrinsics = True
    # full global pose polish (rotation averaging + translation
    # recovery, optim/global_pose.py) — its natural regime
    opts.global_polish = True
    # EXIF-grade focals: registration solves PnP over a focal-scale grid
    # in one batched dispatch and writes the winner back (register.py)
    import dataclasses

    opts.reg = dataclasses.replace(
        opts.reg, focal_scales=(0.85, 0.925, 1.0, 1.08, 1.16)
    )
    # scale-out: global solves (incl. the intrinsics-refining GBA this
    # pipeline always runs) shard over the mesh via parallel/dist_ba
    opts.n_devices = n_devices
    mapper = IncrementalMapper(opts)
    ok = mapper.reconstruct(m)
    if not ok:
        print("[rec_1dsfm] reconstruction failed", flush=True)
        return None
    n_img, n_pts = map_to_colmap(m, output_dir)
    print(
        f"[rec_1dsfm] {n_img} images, {n_pts} points in "
        f"{time.time() - t0:.1f}s",
        flush=True,
    )
    return m
