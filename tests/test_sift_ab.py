"""SIFT quality A/B against cv2.SIFT (SURVEY §7.3: descriptor-level
harness; VERDICT r1 task 6).

cv2.SIFT stands in for the reference's SiftGPU (both are Lowe-style
implementations; SiftGPU is unavailable without CUDA).  Metrics on a
textured image under rotation / scale / translation warps:

  * repeatability — fraction of keypoints whose warped location has a
    detected keypoint within 3 px in the warped image;
  * verified matches — ratio+mutual descriptor matches consistent with
    the known warp (< 3 px).

Acceptance: our extractor reaches >= 90% of cv2.SIFT on each metric
(measured r3: repeatability 0.92-0.96 vs cv2 0.89-0.95; verified
matches equal or HIGHER than cv2 on 4/5 warps — the two detectors fire
on different extrema populations, so parity is per-metric).
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from xrsfm_tpu.ops.sift import SiftExtractor, SiftOptions
from xrsfm_tpu.ops.matching import match_pair_host
from test_sift import make_texture

OPTS = SiftOptions(
    num_octaves=4, features_per_octave=384, max_features=768, first_octave=-1
)


def _warp(img, angle_deg=0.0, scale=1.0, t=(0, 0)):
    h, w = img.shape
    M = cv2.getRotationMatrix2D((w / 2, h / 2), angle_deg, scale)
    M[:, 2] += t
    out = cv2.warpAffine(img, M, (w, h), flags=cv2.INTER_LINEAR)
    return out, M


def _apply_M(M, xy):
    return xy @ M[:, :2].T + M[:, 2]


def _inside(xy, h, w, b=12):
    return (
        (xy[:, 0] >= b) & (xy[:, 0] < w - b)
        & (xy[:, 1] >= b) & (xy[:, 1] < h - b)
    )


def _repeatability(kp1, kp2, M, h, w, tol=3.0):
    from scipy.spatial import cKDTree

    if len(kp1) == 0 or len(kp2) == 0:
        return 0.0
    warped = _apply_M(M, kp1[:, :2])
    ok = _inside(warped, h, w)
    if not np.any(ok):
        return 0.0
    d, _ = cKDTree(kp2[:, :2]).query(warped[ok])
    return float(np.mean(d < tol))


def _ours(img8):
    ex = SiftExtractor(OPTS)
    kps, descs = ex.extract(img8.astype(np.float32) / 255.0)
    return kps, descs


def _cv2_sift(img8, n=768):
    sift = cv2.SIFT_create(nfeatures=n)
    kps, descs = sift.detectAndCompute(img8, None)
    if descs is None:
        return np.zeros((0, 4), np.float32), np.zeros((0, 128), np.uint8)
    xy = np.array([[k.pt[0], k.pt[1], k.size, k.angle] for k in kps],
                  np.float32)
    # RootSIFT-normalize + quantize exactly like our pipeline so both go
    # through the same matcher
    d = descs / np.maximum(np.sum(np.abs(descs), axis=1, keepdims=True),
                           1e-9)
    d = np.sqrt(d)
    return xy, np.minimum(512.0 * d, 255.0).astype(np.uint8)


def _verified_matches(kp1, d1, kp2, d2, M, tol=3.0):
    if len(d1) == 0 or len(d2) == 0:
        return 0
    matches, _ = match_pair_host(d1, d2)
    if len(matches) == 0:
        return 0
    pred = _apply_M(M, kp1[matches[:, 0], :2])
    err = np.linalg.norm(pred - kp2[matches[:, 1], :2], axis=1)
    return int(np.sum(err < tol))


WARPS = [
    ("rot20", dict(angle_deg=20.0)),
    ("rot45", dict(angle_deg=45.0)),
    ("scale0.8", dict(scale=0.8)),
    ("scale1.25", dict(scale=1.25)),
    ("rot30_scale0.9", dict(angle_deg=30.0, scale=0.9)),
]


@pytest.mark.slow
def test_sift_ab_vs_cv2():
    img, _ = make_texture(h=320, w=320, seed=3, n_blobs=220)
    img8 = (img * 255).astype(np.uint8)
    h, w = img8.shape
    rows = []
    for name, kw in WARPS:
        img2, M = _warp(img8, **kw)
        k1o, d1o = _ours(img8)
        k2o, d2o = _ours(img2)
        k1c, d1c = _cv2_sift(img8)
        k2c, d2c = _cv2_sift(img2)
        rep_o = _repeatability(k1o, k2o, M, h, w)
        rep_c = _repeatability(k1c, k2c, M, h, w)
        vm_o = _verified_matches(k1o, d1o, k2o, d2o, M)
        vm_c = _verified_matches(k1c, d1c, k2c, d2c, M)
        rows.append((name, rep_o, rep_c, vm_o, vm_c))
        print(f"[sift-ab] {name}: repeat ours {rep_o:.2f} cv2 {rep_c:.2f}, "
              f"verified ours {vm_o} cv2 {vm_c}", flush=True)
    for name, rep_o, rep_c, vm_o, vm_c in rows:
        assert rep_o >= 0.9 * rep_c - 0.02, (name, rep_o, rep_c)
        assert vm_o >= 0.9 * vm_c - 3, (name, vm_o, vm_c)


def test_orientation_consistency_under_rotation():
    """Dominant orientation must track in-plane rotation with sub-degree
    jitter (fast tier).

    Regression guard for the r4 orientation-NN-tap bug: quantized
    gradient samples jittered the dominant orientation with viewpoint,
    rotating the descriptor grid — the repeatability/verified-matches
    A/B above could NOT see it (detections were unchanged) while the
    e2e arc-smoke ATE degraded 0.27% -> 2.15% (docs/benchmark.md "the
    r4 SIFT quality regression").  Measured discrimination of this
    metric: bilinear orientation taps 0.96 deg median jitter / -17.04
    circular mean at a 17 deg warp; NN taps 4.01 deg jitter / -15.51
    mean.  Gates at 2 deg jitter and 1 deg mean bias."""
    from scipy.spatial import cKDTree

    img, _ = make_texture(256, 256, seed=5, n_blobs=180)
    img8 = (img * 255).astype(np.uint8)
    ang = 17.0
    img2, M = _warp(img8, angle_deg=ang)
    k1, _d1 = _ours(img8)
    k2, _d2 = _ours(img2)
    warped = _apply_M(M, k1[:, :2])
    d, j = cKDTree(k2[:, :2]).query(warped)
    ok = d < 1.5
    assert ok.sum() >= 80, f"only {ok.sum()} repeatable keypoints"
    delta = np.angle(np.exp(1j * (k2[j[ok], 3] - k1[ok, 3])))
    mu = np.angle(np.mean(np.exp(1j * delta)))
    jitter = np.degrees(np.median(np.abs(np.angle(np.exp(1j * (delta - mu))))))
    mean_err = abs(np.degrees(mu) + ang)  # y-down image coords: theta2 ~ theta1 - ang
    assert jitter <= 2.0, f"orientation jitter {jitter:.2f} deg (NN-tap class bug?)"
    assert mean_err <= 1.0, f"orientation mean off by {mean_err:.2f} deg"
