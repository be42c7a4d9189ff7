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


def append_distractors(rng, centers, R, pts_all, n_distractors, half=14.0):
    """Append n_distractors UNREGISTRABLE junk frames — each looks at its
    own private far-away clutter cluster, sharing no structure with the
    genuine scene or with other distractors (the dominant population of
    real 1DSfM collections: Alamo registers 571 of 2,915, reference
    docs/en/benchmark.md:98-114).  Retrieval still ranks neighbors for
    them (top-k is rank-based, not score-gated) — exactly the wasted
    matching work the reference's covisibility expansion avoids."""
    dc = np.zeros((n_distractors, 3))
    dR = np.zeros((n_distractors, 3, 3))
    dpts = []
    for i in range(n_distractors):
        # cluster centers scattered over a huge shell (radius 30-90x the
        # scene) so no two clusters — and no cluster and the genuine
        # structure — fall inside one camera's 40-unit depth range
        th = rng.uniform(0, 2 * np.pi)
        el = rng.uniform(-1.0, 1.0)
        rad = half * rng.uniform(30.0, 90.0)
        dirv = np.array([
            np.cos(el) * np.cos(th), np.sin(el),
            np.cos(el) * np.sin(th),
        ])
        cluster = rad * dirv
        cam = cluster - dirv * rng.uniform(6.0, 12.0) + rng.normal(
            scale=0.5, size=3
        )
        dc[i] = cam
        dR[i] = look_at_R(cam, cluster)
        dpts.append(cluster + rng.normal(scale=1.5, size=(300, 3)))
    centers = np.concatenate([centers, dc])
    R = np.concatenate([R, dR])
    pts_all = np.concatenate([pts_all] + dpts)
    return centers, R, pts_all


DISTRACTOR_PTS = 300  # points per junk cluster (append_distractors)


def tour_scene(rng, n_frames, n_distractors=0, frames_per_building=25,
               spacing=24.0):
    """Landmark TOUR (sparse genuine graph — the real 1DSfM topology the
    r4 review asked for): a street of separate building facades, cameras
    walking past on the far sidewalk looking across.  A camera sees
    ~±9.6 units of facade (FOV ±44 deg at ~10 m), so ground-truth
    covisible pairs grow LINEARLY with frame count (a band graph over
    the walk order + gap-bridging strips), unlike unordered_scene's
    central landmark where every camera sees the same building and gt
    pairs grow quadratically.  The 16-unit facades with 8-unit gaps
    keep the band connected: a camera opposite a gap shares a >5-unit
    facade strip with cameras centered on both neighbors."""
    n_buildings = max(2, int(np.ceil(n_frames / frames_per_building)))
    half_w = spacing / 3.0  # facade half-width (16-unit facade at B=24)
    street = 10.0  # facade plane z
    pts = []
    for b in range(n_buildings):
        bx = b * spacing
        npw = 2200
        a = rng.uniform(-half_w, half_w, npw)
        h = rng.uniform(-1.0, 6.0, npw)
        relief = rng.uniform(0.0, 1.2, npw)  # protrusions toward street
        p = np.zeros((npw, 3))
        p[:, 0] = bx + a
        p[:, 1] = h
        p[:, 2] = street - relief
        pts.append(p)
        # ground strip in front of the building
        n_g = 500
        g = np.zeros((n_g, 3))
        g[:, 0] = bx + rng.uniform(-half_w, half_w, n_g)
        g[:, 1] = rng.uniform(-1.2, -0.9, n_g)
        g[:, 2] = rng.uniform(4.0, street - 0.5, n_g)
        pts.append(g)
    pts_all = np.concatenate(pts)
    length = (n_buildings - 1) * spacing
    # a small fraction of WIDE overview shots (tourist context photos,
    # one per gap) standing far back so two adjacent facades share one
    # frame — real collections bridge landmark clusters this way, and
    # without them top-5 retrieval seeds never propose a cross-gap pair
    # (both sides always have closer same-side neighbors) and the
    # genuine graph fragments (measured: a 120-frame street broke into
    # 62+58 at one gap).  Overviews keep pair growth linear: each links
    # ~2 clusters' worth of frames.
    n_over = max(0, 2 * (n_buildings - 1))  # 2 context shots per gap —
    # one bridge can miss every top-5 list once junk dilutes retrieval
    # (measured: 1 overview/gap left 28 of 250 genuine frames
    # unreachable at 90% junk)
    n_walk = max(2, n_frames - n_over)
    xs = np.sort(rng.uniform(-0.4 * spacing, length + 0.4 * spacing,
                             n_walk))
    over_x = (np.arange(n_over) // 2 + 0.5) * spacing
    centers = np.zeros((n_walk + n_over, 3))
    centers[:n_walk, 0] = xs
    centers[:n_walk, 1] = rng.uniform(-0.2, 1.2, n_walk)
    centers[:n_walk, 2] = rng.uniform(-2.0, 2.0, n_walk)
    centers[n_walk:, 0] = over_x + rng.uniform(-2.0, 2.0, n_over)
    centers[n_walk:, 1] = rng.uniform(0.5, 2.0, n_over)
    centers[n_walk:, 2] = rng.uniform(-24.0, -19.0, n_over)
    R = np.zeros((n_walk + n_over, 3, 3))
    for i in range(n_walk):
        tgt = np.array([
            xs[i] + rng.uniform(-3.0, 3.0),
            rng.uniform(0.5, 2.5),
            street,
        ])
        R[i] = look_at_R(centers[i], tgt)
    for i in range(n_over):
        tgt = np.array([
            over_x[i] + rng.uniform(-2.0, 2.0), rng.uniform(1.0, 3.0),
            street,
        ])
        R[n_walk + i] = look_at_R(centers[n_walk + i], tgt)
    n_frames = n_walk + n_over
    if n_distractors:
        centers, R, pts_all = append_distractors(
            rng, centers, R, pts_all, n_distractors, half=14.0
        )
    return centers, R, pts_all


def unordered_scene(rng, n_frames, half=14.0, n_distractors=0):
    """Landmark ring (the actual 1DSfM regime — internet photos of one
    central landmark, e.g. Alamo/NYC_Library): cameras scattered on an
    annulus looking INWARD at a central building, yaw jittered.  Nearby
    viewpoints overlap heavily (dense covisibility, long tracks); views
    from opposite sides connect around the ring.

    n_distractors appends UNREGISTRABLE junk frames — the dominant
    population of real 1DSfM collections (Alamo registers 571 of 2,915
    images, reference docs/en/benchmark.md:98-114).  Each distractor
    looks at its own private far-away clutter cluster, sharing no
    structure with the landmark or with other distractors — retrieval
    still ranks neighbors for them (top-k is rank-based, not
    score-gated), which is exactly the wasted matching work the
    reference's covisibility expansion exists to avoid."""
    ang = rng.uniform(0, 2 * np.pi, n_frames)
    rad = rng.uniform(0.55 * half, 1.15 * half, n_frames)
    centers = np.zeros((n_frames, 3))
    centers[:, 0] = rad * np.cos(ang)
    centers[:, 2] = rad * np.sin(ang)
    centers[:, 1] = rng.uniform(-0.5, 1.5, n_frames)
    R = np.zeros((n_frames, 3, 3))
    for i in range(n_frames):
        # aim at the building with moderate jitter
        tgt = np.array([
            rng.uniform(-2.0, 2.0), rng.uniform(-1.0, 2.0),
            rng.uniform(-2.0, 2.0),
        ])
        R[i] = look_at_R(centers[i], tgt)
    # central building: 4 facades (half-size s) with protruding details
    # (depth variation breaks the per-camera focal-depth ambiguity),
    # plus sparse ground points around it
    pts = []
    s = 0.3 * half
    npw = 5000
    for wall in range(4):
        a = rng.uniform(-s, s, npw)
        h = rng.uniform(-1.0, 6.0, npw)
        relief = rng.uniform(0.0, 1.2, npw)  # protrusions
        p = np.zeros((npw, 3))
        if wall == 0:
            p[:, 0], p[:, 2] = a, s - relief
        elif wall == 1:
            p[:, 0], p[:, 2] = a, -s + relief
        elif wall == 2:
            p[:, 0], p[:, 2] = s - relief, a
        else:
            p[:, 0], p[:, 2] = -s + relief, a
        p[:, 1] = h
        pts.append(p)
    n_ground = 4000
    gr = np.zeros((n_ground, 3))
    rr = rng.uniform(0.35 * half, 0.9 * half, n_ground)
    aa = rng.uniform(0, 2 * np.pi, n_ground)
    gr[:, 0] = rr * np.cos(aa)
    gr[:, 2] = rr * np.sin(aa)
    gr[:, 1] = rng.uniform(-1.2, -0.8, n_ground)
    pts.append(gr)
    pts_all = np.concatenate(pts)
    if n_distractors:
        centers, R, pts_all = append_distractors(
            rng, centers, R, pts_all, n_distractors, half=half
        )
    return centers, R, pts_all


def make_scene(scene, rng, n_frames, n_distractors=0):
    """Scene dispatcher shared by main() and mirror consumers
    (run_unordered_bench regenerates the scene with the same rng to
    recover ground-truth covisibility)."""
    if scene == "kitti":
        return kitti_scene(rng, n_frames)
    if scene == "tour":
        return tour_scene(rng, n_frames, n_distractors=n_distractors)
    return unordered_scene(rng, n_frames, n_distractors=n_distractors)


def project_all(centers, R, pts, rng, max_kp=700, z_range=(1.0, 40.0),
                noise_px=0.4, focals=None, k1s=None):
    """Visibility + projection for every frame.  Returns per-frame
    (point_ids, uv_px) with at most max_kp keypoints (nearest first).

    focals/k1s (optional, [n_frames]): per-image SIMPLE_RADIAL cameras —
    uv = f * x(1 + k r^2) + c in normalized coords (the 1DSfM regime,
    reference rec_1dsfm.cc:46-55)."""
    out = []
    for i in range(len(centers)):
        f_i = FX if focals is None else float(focals[i])
        k_i = 0.0 if k1s is None else float(k1s[i])
        pc = (pts - centers[i]) @ R[i].T
        z = pc[:, 2]
        ok = (z > z_range[0]) & (z < z_range[1])
        zz = np.where(ok, z, 1.0)
        x = pc[:, 0] / zz
        y = pc[:, 1] / zz
        r2 = x * x + y * y
        d = 1.0 + k_i * r2
        u = f_i * x * d + CX
        v = f_i * y * d + CY
        ok &= (u > 8) & (u < W - 8) & (v > 8) & (v < H - 8)
        # keep the distortion model valid (monotone) inside the FOV
        ok &= d > 0.6
        ids = np.nonzero(ok)[0]
        if len(ids) > max_kp:
            ids = ids[np.argsort(z[ids])[:max_kp]]
        uv = np.stack([u[ids], v[ids]], 1)
        uv = uv + rng.normal(scale=noise_px, size=uv.shape)
        out.append((ids.astype(np.int64), uv.astype(np.float32)))
    return out


def synth_descriptors(frames_obs, n_points, rng, noise=0.25,
                      sparsity=0.65):
    """Per-3D-point SIFT-like descriptors + per-observation noise, so the
    REAL matching stage (VLAD retrieval, ratio-test matching, geometric
    verification, covisibility expansion) runs on this workspace instead
    of consuming the GT pair list.

    The matcher consumes the reference's uint8 quantization — L1-root
    normalized, scaled by 512, cos(angle) = <d1,d2>/512^2 (ops/matching.py;
    reference sift_extractor.h:22-34) — so descriptors must live on that
    manifold: sparse non-negative raw histograms (real SIFT is ~60%
    near-zero bins, which keeps unrelated descriptors' angular distance
    above the 0.7 accept gate), L1-root normalized per observation after
    multiplicative noise."""
    raw = rng.exponential(1.0, size=(n_points, 128)).astype(np.float32)
    raw *= rng.random((n_points, 128)) > sparsity  # sparse support
    raw += 1e-6
    descs = []
    for ids, _uv in frames_obs:
        r = raw[ids] * (1.0 + rng.normal(scale=noise, size=(len(ids), 128))
                        ).clip(0.05)
        v = np.sqrt(r / r.sum(axis=1, keepdims=True))
        descs.append(np.clip(512.0 * v, 0, 255).astype(np.uint8))
    return descs


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


def main(out_dir, scene="kitti", n_frames=1000, seed=0,
         per_image_cameras=False, focal_noise=0.08, descriptors=False,
         distractors=0):
    """per_image_cameras: the 1DSfM regime — every frame gets its own
    SIMPLE_RADIAL camera (true focal U[430,570], k1 U[-0.08,0.04]);
    camera_info.txt carries EXIF-like focals perturbed by
    U[-focal_noise, +focal_noise] with k=0 (reference rec_1dsfm.cc:46-55
    starts from noisy EXIF focals and zero distortion), and
    gt_cameras.txt records the true parameters for evaluation.

    descriptors: synthesize per-point descriptors (+ size.bin) so the
    real matching stage runs on this workspace (fp.bin still carries the
    GT-covisibility pair list for matching-free reconstruction runs)."""
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    centers, R, pts = make_scene(scene, rng, n_frames,
                                 n_distractors=distractors)
    n_frames = len(centers)  # includes distractor frames
    focals = k1s = None
    if per_image_cameras:
        focals = rng.uniform(430.0, 570.0, n_frames)
        k1s = rng.uniform(-0.08, 0.04, n_frames)
    frames_obs = project_all(centers, R, pts, rng, focals=focals, k1s=k1s)
    names = [f"img{i:05d}.png" for i in range(n_frames)]
    descs = (
        synth_descriptors(frames_obs, len(pts), rng) if descriptors else None
    )
    feats = []
    for i, (ids, uv) in enumerate(frames_obs):
        kp = np.zeros((len(uv), 4), np.float32)
        kp[:, :2] = uv
        kp[:, 2] = 2.0
        feats.append(IOF.FrameFeatures(
            name=names[i], keypoints=kp,
            descriptors=(
                descs[i] if descs is not None
                else np.zeros((len(uv), 128), np.uint8)
            ),
        ))
    IOF.write_features(os.path.join(out_dir, "ftr.bin"), feats,
                       with_descs=True)
    if descriptors:
        IOF.write_image_size(
            os.path.join(out_dir, "size.bin"),
            np.tile(np.asarray([[W, H]], np.int32), (n_frames, 1)),
        )
    pairs = build_pairs(frames_obs, n_frames, scene, rng,
                        loop_centers=centers)
    IOF.write_frame_pairs(os.path.join(out_dir, "fp.bin"), pairs)
    if per_image_cameras:
        noisy = focals * (1.0 + rng.uniform(-focal_noise, focal_noise,
                                            n_frames))
        with open(os.path.join(out_dir, "camera_info.txt"), "w") as f:
            for i in range(n_frames):
                f.write(f"{names[i]} SIMPLE_RADIAL {W} {H} "
                        f"{noisy[i]:.3f} {CX} {CY} 0.0\n")
        with open(os.path.join(out_dir, "gt_cameras.txt"), "w") as f:
            for i in range(n_frames):
                f.write(f"{names[i]} {focals[i]:.6f} {k1s[i]:.8f}\n")
    else:
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
    ap.add_argument("--scene", default="kitti",
                    choices=["kitti", "unordered", "tour"])
    ap.add_argument("--n_frames", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--per_image_cameras", action="store_true",
                    help="1DSfM regime: per-image SIMPLE_RADIAL + "
                         "noisy-focal camera_info.txt")
    ap.add_argument("--focal_noise", type=float, default=0.08)
    ap.add_argument("--descriptors", action="store_true",
                    help="synthesize matchable descriptors + size.bin")
    ap.add_argument("--distractors", type=int, default=0,
                    help="unordered scene: append this many unregistrable "
                         "junk frames (the dominant population of real "
                         "1DSfM collections)")
    a = ap.parse_args()
    main(a.out_dir, a.scene, a.n_frames, a.seed,
         per_image_cameras=a.per_image_cameras,
         focal_noise=a.focal_noise, descriptors=a.descriptors,
         distractors=a.distractors)
