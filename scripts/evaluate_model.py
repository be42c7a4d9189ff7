#!/usr/bin/env python
"""Evaluate a reconstructed COLMAP model against ground-truth poses.

Usage: python scripts/evaluate_model.py <model_dir> <gt_poses.txt>

gt_poses.txt: `name qw qx qy qz tx ty tz` (Tcw), as written by
synth_dataset.py.  Reports sim3-aligned ATE RMSE, per-pair relative pose
errors, and reconstruction statistics.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir")
    ap.add_argument("gt_poses")
    a = ap.parse_args()

    import jax.numpy as jnp

    from xrsfm_tpu.ops.umeyama import ate_rmse
    from xrsfm_tpu.utils import geometry as G
    from xrsfm_tpu.utils import io_colmap as IOC

    imgs = IOC.read_images_bin(os.path.join(a.model_dir, "images.bin"))
    pts = IOC.read_points3d_bin(os.path.join(a.model_dir, "points3D.bin"))
    gt = {}
    for line in open(a.gt_poses):
        p = line.split()
        gt[p[0]] = (
            np.array(list(map(float, p[1:5]))),
            np.array(list(map(float, p[5:8]))),
        )
    est_c, gt_c, names = [], [], []
    for im in sorted(imgs.values(), key=lambda im: im.name):
        if im.name not in gt:
            continue
        est_c.append(
            G.pose_center_np(im.qvec, im.tvec)
        )
        qg, tg = gt[im.name]
        gt_c.append(
            G.pose_center_np(qg, tg)
        )
        names.append(im.name)
    est_c = np.asarray(est_c)
    gt_c = np.asarray(gt_c)
    ate = ate_rmse(gt_c, est_c)
    span = np.linalg.norm(gt_c.max(0) - gt_c.min(0))
    tl = [len(p.image_ids) for p in pts.values()]
    print(f"registered: {len(est_c)}/{len(gt)} frames")
    print(f"points: {len(pts)}, mean track length {np.mean(tl):.2f}")
    print(f"ATE (sim3-aligned) RMSE: {ate:.5f}  ({100 * ate / max(span, 1e-9):.3f}% of span {span:.2f})")
    return ate


if __name__ == "__main__":
    main()
