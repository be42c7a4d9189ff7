#!/usr/bin/env python
"""Feature-level synthetic workspaces at REFERENCE scale (no images).

The reference's de-facto QA regime is KITTI (thousands of sequential
frames) and 1DSfM (1,000+ unordered internet images with dense
covisibility) — reference docs/en/benchmark.md:80-114.  Those datasets
are not on this machine, so this generator builds workspaces of the
same shape directly at the feature level (ftr.bin / fp.bin /
camera.txt / gt_poses.txt): ground-truth geometry, projected keypoints
with pixel noise, verified match lists with a controlled contamination
rate.  The reconstruction stage (the scale-critical part: host
bookkeeping + BA) then runs end-to-end exactly as it would from real
images via `python -m xrsfm_tpu.cli run_reconstruction`.

Scenes:
  kitti      forward-motion square circuit with loop closure pairs
             (KITTI class: sequential covisibility, long chain)
  unordered  cameras scattered in a plaza looking at the facades
             (1DSfM class: dense covisibility, long tracks)
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xrsfm_tpu.utils import io_features as IOF  # noqa: E402
from xrsfm_tpu.utils import geometry as G  # noqa: E402

FX = 500.0
W, H = 960, 720
CX, CY = W / 2.0, H / 2.0


def look_at_R(center, target, up=(0.0, -1.0, 0.0)):
    z = np.asarray(target, np.float64) - center
    z /= np.linalg.norm(z)
    x = np.cross(up, z)
    if np.linalg.norm(x) < 1e-9:
        x = np.array([1.0, 0, 0])
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z])


def kitti_scene(rng, n_frames, step=0.5):
    """Square circuit; cameras look along the motion; walls of points."""
    seg = n_frames // 4
    dirs = np.array([[1, 0, 0], [0, 0, 1], [-1, 0, 0], [0, 0, -1]], float)
    centers = np.zeros((n_frames, 3))
    for i in range(1, n_frames):
        centers[i] = centers[i - 1] + step * dirs[min((i - 1) // seg, 3)]
    # heading smoothed over +-4 frames (a vehicle turns gradually; an
    # instantaneous 90-degree corner shares no FOV between consecutive
    # frames and severs the covisibility chain)
    R = np.zeros((n_frames, 3, 3))
    for i in range(n_frames):
        a = max(0, i - 4)
        b = min(n_frames - 1, i + 4)
        fwd = centers[b] - centers[a]
        if np.linalg.norm(fwd) < 1e-9:
            fwd = dirs[min(i // seg, 3)]
        R[i] = look_at_R(centers[i], centers[i] + fwd)
    # wall points flanking the path (both sides), plus ground points
    pts = []
    L = seg * step
    for side in (-3.0, 3.0):
        for wall in range(4):
            n_pts = int(L * 14)
            a = rng.uniform(0, L, n_pts)
            h = rng.uniform(-2.0, 2.0, n_pts)
            base = np.zeros((n_pts, 3))
            d = dirs[wall]
            perp = np.array([-d[2], 0, d[0]])
            start = centers[wall * seg]
            base = start + a[:, None] * d + side * perp + 0.0
            base[:, 1] = h
            pts.append(base)
    pts = np.concatenate(pts)
    return centers, R, pts


def unordered_scene(rng, n_frames, half=14.0):
    """Plaza: cameras inside, looking outward at 4 facades of points."""
    centers = np.zeros((n_frames, 3))
    centers[:, 0] = rng.uniform(-half * 0.5, half * 0.5, n_frames)
    centers[:, 2] = rng.uniform(-half * 0.5, half * 0.5, n_frames)
    centers[:, 1] = rng.uniform(-0.5, 0.5, n_frames)
    yaw = rng.uniform(0, 2 * np.pi, n_frames)
    R = np.zeros((n_frames, 3, 3))
    for i in range(n_frames):
        tgt = centers[i] + np.array(
            [np.cos(yaw[i]), rng.uniform(-0.1, 0.1), np.sin(yaw[i])]
        )
        R[i] = look_at_R(centers[i], tgt)
    # facade points on the 4 walls of the plaza
    pts = []
    npw = 6000
    for wall in range(4):
        a = rng.uniform(-half, half, npw)
        h = rng.uniform(-3.0, 5.0, npw)
        p = np.zeros((npw, 3))
        if wall == 0:
            p[:, 0], p[:, 2] = a, half
        elif wall == 1:
            p[:, 0], p[:, 2] = a, -half
        elif wall == 2:
            p[:, 0], p[:, 2] = half, a
        else:
            p[:, 0], p[:, 2] = -half, a
        p[:, 1] = h
        pts.append(p)
    return centers, R, np.concatenate(pts)


def project_all(centers, R, pts, rng, max_kp=700, z_range=(1.0, 40.0),
                noise_px=0.4):
    """Visibility + projection for every frame.  Returns per-frame
    (point_ids, uv_px) with at most max_kp keypoints (nearest first)."""
    out = []
    for i in range(len(centers)):
        pc = (pts - centers[i]) @ R[i].T
        z = pc[:, 2]
        ok = (z > z_range[0]) & (z < z_range[1])
        u = FX * pc[:, 0] / np.where(ok, z, 1.0) + CX
        v = FX * pc[:, 1] / np.where(ok, z, 1.0) + CY
        ok &= (u > 8) & (u < W - 8) & (v > 8) & (v < H - 8)
        ids = np.nonzero(ok)[0]
        if len(ids) > max_kp:
            ids = ids[np.argsort(z[ids])[:max_kp]]
        uv = np.stack([u[ids], v[ids]], 1)
        uv = uv + rng.normal(scale=noise_px, size=uv.shape)
        out.append((ids.astype(np.int64), uv.astype(np.float32)))
    return out


def build_pairs(frames_obs, n_frames, kind, rng, min_shared=30,
                contamination=0.03, top_per_frame=25, loop_centers=None):
    """Pair list with matches from shared point ids (+ contamination)."""
    # inverted index: point -> (frame, local_idx)
    pt_frames = {}
    for f, (ids, _) in enumerate(frames_obs):
        for k, pid in enumerate(ids):
            pt_frames.setdefault(int(pid), []).append((f, k))
    if kind == "kitti":
        cand = set()
        for i in range(n_frames):
            for k in range(1, 6):
                if i + k < n_frames:
                    cand.add((i, i + k))
        # loop closures by proximity
        c = loop_centers
        for i in range(0, n_frames, 2):
            d = np.linalg.norm(c - c[i], axis=1)
            close = np.nonzero((d < 4.0) & (np.abs(np.arange(n_frames) - i) > 50))[0]
            for j in close[:3]:
                a, b = (i, int(j)) if i < j else (int(j), i)
                cand.add((a, b))
        cand = sorted(cand)
    else:
        # co-occurrence counts over the inverted index
        from collections import Counter

        cnt = Counter()
        for pid, obs in pt_frames.items():
            if len(obs) > 40:
                obs = [obs[x] for x in
                       rng.choice(len(obs), 40, replace=False)]
            fs = sorted(set(f for f, _ in obs))
            for a in range(len(fs)):
                for b in range(a + 1, len(fs)):
                    cnt[(fs[a], fs[b])] += 1
        # top pairs per frame (retrieval-like cap)
        per_frame = [[] for _ in range(n_frames)]
        for (a, b), c_ in cnt.items():
            if c_ >= min_shared:
                per_frame[a].append((c_, a, b))
                per_frame[b].append((c_, a, b))
        cand = set()
        for lst in per_frame:
            lst.sort(reverse=True)
            for c_, a, b in lst[:top_per_frame]:
                cand.add((a, b))
        cand = sorted(cand)

    pairs = []
    for a, b in cand:
        ids_a, _ = frames_obs[a]
        ids_b, _ = frames_obs[b]
        pos_b = {int(p): k for k, p in enumerate(ids_b)}
        rows = [(k, pos_b[int(p)]) for k, p in enumerate(ids_a)
                if int(p) in pos_b]
        if len(rows) < min_shared:
            continue
        m = np.asarray(rows, np.int32)
        # contamination: rewire a few matches to wrong targets (they are
        # marked inliers — the mapper must absorb them like imperfect
        # geometric verification would leave behind)
        n_bad = int(contamination * len(m))
        if n_bad:
            sel = rng.choice(len(m), n_bad, replace=False)
            m[sel, 1] = rng.integers(0, len(ids_b), n_bad)
        pairs.append(
            IOF.FramePairData(
                id1=a, id2=b, matches=m,
                distances=np.zeros(len(m)),
                E=np.eye(3),
                inlier_num=len(m),
                inlier_mask=np.ones(len(m), bool),
            )
        )
    return pairs


def main(out_dir, scene="kitti", n_frames=1000, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    if scene == "kitti":
        centers, R, pts = kitti_scene(rng, n_frames)
    else:
        centers, R, pts = unordered_scene(rng, n_frames)
    frames_obs = project_all(centers, R, pts, rng)
    names = [f"img{i:05d}.png" for i in range(n_frames)]
    feats = []
    for i, (ids, uv) in enumerate(frames_obs):
        kp = np.zeros((len(uv), 4), np.float32)
        kp[:, :2] = uv
        kp[:, 2] = 2.0
        feats.append(IOF.FrameFeatures(
            name=names[i], keypoints=kp,
            descriptors=np.zeros((len(uv), 128), np.uint8),
        ))
    IOF.write_features(os.path.join(out_dir, "ftr.bin"), feats,
                       with_descs=True)
    pairs = build_pairs(frames_obs, n_frames, scene, rng,
                        loop_centers=centers)
    IOF.write_frame_pairs(os.path.join(out_dir, "fp.bin"), pairs)
    with open(os.path.join(out_dir, "camera.txt"), "w") as f:
        f.write(f"0 PINHOLE {W} {H} {FX} {FX} {CX} {CY}\n")
    with open(os.path.join(out_dir, "gt_poses.txt"), "w") as f:
        for i in range(n_frames):
            q = G.rotmat_to_quat_np(R[i])
            t = -R[i] @ centers[i]
            f.write(
                f"{names[i]} {q[0]:.9f} {q[1]:.9f} {q[2]:.9f} {q[3]:.9f} "
                f"{t[0]:.6f} {t[1]:.6f} {t[2]:.6f}\n"
            )
    n_obs = sum(len(u) for _, u in frames_obs)
    print(
        f"wrote {scene} workspace: {n_frames} frames, {len(pts)} points, "
        f"{n_obs} observations, {len(pairs)} pairs -> {out_dir}",
        flush=True,
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--scene", default="kitti", choices=["kitti", "unordered"])
    ap.add_argument("--n_frames", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()
    main(a.out_dir, a.scene, a.n_frames, a.seed)
