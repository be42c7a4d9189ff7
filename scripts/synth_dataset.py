#!/usr/bin/env python
"""Render a synthetic multi-view dataset (images + camera.txt + GT poses).

Serves the role of the reference's test_data workspace (README.md:55-63):
a small end-to-end smoke dataset — but generated, so ground truth poses
are known and ATE can be measured.

Scene: textured gaussian blobs on a fronto-parallel wall + floor, viewed
from an arc of cameras.  Output layout:
  <out>/images/*.png
  <out>/camera.txt          (reference single-camera format)
  <out>/gt_poses.txt        (name qw qx qy qz tx ty tz, Tcw)
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def look_at_R(center, target):
    z = np.asarray(target, np.float64) - center
    z /= np.linalg.norm(z)
    x = np.cross([0.0, -1.0, 0.0], z)
    if np.linalg.norm(x) < 1e-9:
        x = np.array([1.0, 0, 0])
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z])


def render(pts, colors, sigmas, R, t, f, cx, cy, w, h):
    img = np.zeros((h, w), np.float32)
    pc = pts @ R.T + t
    z = pc[:, 2]
    vis = z > 0.2
    uv = pc[vis, :2] / pc[vis, 2:3] * f + [cx, cy]
    s_px = sigmas[vis] * f / z[vis]
    c = colors[vis]
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    order = np.argsort(-z[vis])  # far to near
    for i in order:
        u, v = uv[i]
        s = max(s_px[i], 0.8)
        if u < -3 * s or u > w + 3 * s or v < -3 * s or v > h + 3 * s:
            continue
        y0, y1 = int(max(0, v - 3 * s)), int(min(h, v + 3 * s + 1))
        x0, x1 = int(max(0, u - 3 * s)), int(min(w, u + 3 * s + 1))
        g = np.exp(
            -((yy[y0:y1, x0:x1] - v) ** 2 + (xx[y0:y1, x0:x1] - u) ** 2)
            / (2 * s * s)
        )
        img[y0:y1, x0:x1] = img[y0:y1, x0:x1] * (1 - g) + c[i] * g
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def main(out_dir, n_cams=8, n_pts=400, seed=3, w=512, h=384, f=450.0):
    import cv2

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(out_dir, "images"), exist_ok=True)
    cx, cy = w / 2, h / 2
    # blobs on a wall at z in [6, 9] + floor
    pts = np.concatenate(
        [
            np.stack(
                [rng.uniform(-4, 4, n_pts // 2), rng.uniform(-2, 2, n_pts // 2),
                 rng.uniform(6, 7, n_pts // 2)], -1,
            ),
            np.stack(
                [rng.uniform(-4, 4, n_pts // 2), np.full(n_pts // 2, 1.8),
                 rng.uniform(2.5, 7, n_pts // 2)], -1,
            ),
        ]
    )
    colors = rng.uniform(0.25, 1.0, len(pts))
    sigmas = rng.uniform(0.02, 0.05, len(pts))

    names = []
    poses = []
    for i in range(n_cams):
        ang = (i / max(n_cams - 1, 1) - 0.5) * 0.9
        center = np.array([3.5 * np.sin(ang), 0.25 * np.sin(2.2 * i), 3.5 * (1 - np.cos(ang))])
        R = look_at_R(center, [0.0, 0.0, 6.5])
        t = -R @ center
        img = render(pts, colors, sigmas, R, t, f, cx, cy, w, h)
        name = f"frame{i:04d}.png"
        cv2.imwrite(os.path.join(out_dir, "images", name), img)
        names.append(name)
        # quaternion from R
        tr = np.trace(R)
        qw = np.sqrt(max(0, 1 + tr)) / 2
        q = np.array(
            [qw, (R[2, 1] - R[1, 2]) / (4 * qw), (R[0, 2] - R[2, 0]) / (4 * qw),
             (R[1, 0] - R[0, 1]) / (4 * qw)]
        )
        poses.append((q / np.linalg.norm(q), t))
    with open(os.path.join(out_dir, "camera.txt"), "w") as fh:
        fh.write(f"0 PINHOLE {w} {h} {f} {f} {cx} {cy}\n")
    with open(os.path.join(out_dir, "gt_poses.txt"), "w") as fh:
        for name, (q, t) in zip(names, poses):
            fh.write(
                f"{name} {q[0]} {q[1]} {q[2]} {q[3]} {t[0]} {t[1]} {t[2]}\n"
            )
    print(f"wrote {n_cams} images to {out_dir}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n_cams", type=int, default=8)
    ap.add_argument("--n_pts", type=int, default=400)
    ap.add_argument("--seed", type=int, default=3)
    a = ap.parse_args()
    main(a.out_dir, a.n_cams, a.n_pts, a.seed)
