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


def make_textures(rng, res=1024, smooth=3):
    """Random smooth textures for the wall and floor planes."""
    try:
        import cv2

        def tex():
            t = rng.uniform(0, 1, (res, res)).astype(np.float32)
            t = cv2.GaussianBlur(t, (0, 0), smooth)
            t = (t - t.min()) / (t.max() - t.min() + 1e-9)
            return t
    except ImportError:
        def tex():
            return rng.uniform(0, 1, (res, res)).astype(np.float32)

    return tex(), tex()


def render_planes(tex_wall, tex_floor, R, t, f, cx, cy, w, h,
                  wall_z=6.8, floor_y=1.8, extent=8.0):
    """Ray-cast two textured Lambertian planes — every pixel observes a
    fixed 3D point, so features are fully view-consistent (a blob splat
    compositor creates parallax 'virtual features' that break SfM GT
    evaluation)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    dirs_cam = np.stack(
        [(xx - cx) / f, (yy - cy) / f, np.ones_like(xx)], axis=-1
    )  # [h,w,3]
    Rt = R.T
    dirs = dirs_cam @ Rt.T  # world ray directions
    origin = -Rt @ t

    def sample(tex, uu, vv):
        res = tex.shape[0]
        ui = np.clip((uu * (res - 1)).astype(np.int64), 0, res - 1)
        vi = np.clip((vv * (res - 1)).astype(np.int64), 0, res - 1)
        return tex[vi, ui]

    img = np.zeros((h, w), np.float64)
    depth = np.full((h, w), np.inf)

    # wall: plane z = wall_z
    dz = dirs[..., 2]
    s = np.where(np.abs(dz) > 1e-9, (wall_z - origin[2]) / dz, -1.0)
    hit = s > 0.2
    px = origin[None, None, :] + s[..., None] * dirs
    uu = (px[..., 0] + extent / 2) / extent
    vv = (px[..., 1] + extent / 2) / extent
    ok = hit & (uu >= 0) & (uu < 1) & (vv >= 0) & (vv < 1) & (s < depth)
    img = np.where(ok, sample(tex_wall, uu, vv), img)
    depth = np.where(ok, s, depth)

    # floor: plane y = floor_y
    dy = dirs[..., 1]
    s = np.where(np.abs(dy) > 1e-9, (floor_y - origin[1]) / dy, -1.0)
    hit = (s > 0.2)
    px = origin[None, None, :] + s[..., None] * dirs
    uu = (px[..., 0] + extent / 2) / extent
    vv = px[..., 2] / extent
    ok = hit & (uu >= 0) & (uu < 1) & (vv >= 0) & (vv < 1) & (s < depth)
    img = np.where(ok, sample(tex_floor, uu, vv), img)

    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def main(out_dir, n_cams=8, n_pts=400, seed=3, w=512, h=384, f=450.0):
    import cv2

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(out_dir, "images"), exist_ok=True)
    cx, cy = w / 2, h / 2
    tex_wall, tex_floor = make_textures(rng)

    names = []
    poses = []
    for i in range(n_cams):
        ang = (i / max(n_cams - 1, 1) - 0.5) * 0.9
        center = np.array([3.5 * np.sin(ang), 0.25 * np.sin(2.2 * i), 3.5 * (1 - np.cos(ang))])
        R = look_at_R(center, [0.0, 0.0, 6.5])
        t = -R @ center
        img = render_planes(tex_wall, tex_floor, R, t, f, cx, cy, w, h)
        name = f"frame{i:04d}.png"
        cv2.imwrite(os.path.join(out_dir, "images", name), img)
        names.append(name)
        # robust branch-free quaternion conversion (the naive
        # qw=sqrt(1+tr)/2 form divides by ~0 for 180-degree rotations)
        import jax.numpy as jnp

        from xrsfm_tpu.utils import geometry as G

        q = np.asarray(G.rotmat_to_quat(jnp.asarray(R, jnp.float64).astype(jnp.float32)))
        poses.append((q / np.linalg.norm(q), t))
    with open(os.path.join(out_dir, "camera.txt"), "w") as fh:
        fh.write(f"0 PINHOLE {w} {h} {f} {f} {cx} {cy}\n")
    with open(os.path.join(out_dir, "gt_poses.txt"), "w") as fh:
        for name, (q, t) in zip(names, poses):
            fh.write(
                f"{name} {q[0]} {q[1]} {q[2]} {q[3]} {t[0]} {t[1]} {t[2]}\n"
            )
    # retrieval ranks (needed by the retrieval/covisibility matching
    # strategies): cameras sit on an arc, so view overlap is monotone in
    # index distance — rank every other image by |i - j|
    with open(os.path.join(out_dir, "retrieval.txt"), "w") as fh:
        for i, name in enumerate(names):
            for j in sorted(range(n_cams), key=lambda j: abs(i - j)):
                if j != i:
                    fh.write(f"{name} {names[j]}\n")
    print(f"wrote {n_cams} images to {out_dir}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n_cams", type=int, default=8)
    ap.add_argument("--n_pts", type=int, default=400)
    ap.add_argument("--seed", type=int, default=3)
    a = ap.parse_args()
    main(a.out_dir, a.n_cams, a.n_pts, a.seed)
