import numpy as np
import pytest

from xrsfm_tpu.ops.sift import SiftExtractor, SiftOptions


def make_texture(h=256, w=256, seed=0, n_blobs=120):
    """Random gaussian-blob texture with well-defined interest points."""
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.float32)
    ys = rng.uniform(20, h - 20, n_blobs)
    xs = rng.uniform(20, w - 20, n_blobs)
    sg = rng.uniform(1.5, 4.0, n_blobs)
    amp = rng.uniform(0.4, 1.0, n_blobs) * rng.choice([-1, 1], n_blobs)
    yy, xx = np.mgrid[0:h, 0:w]
    for y, x, s, a in zip(ys, xs, sg, amp):
        img += a * np.exp(-((yy - y) ** 2 + (xx - x) ** 2) / (2 * s * s))
    img = (img - img.min()) / (img.max() - img.min())
    return img, np.stack([xs, ys], -1)


SMALL = SiftOptions(
    num_octaves=2, features_per_octave=256, max_features=512, first_octave=0
)


@pytest.mark.slow
def test_sift_detects_blobs():
    img, blob_xy = make_texture()
    ex = SiftExtractor(SMALL)
    kps, descs = ex.extract(img)
    assert len(kps) > 60, f"only {len(kps)} keypoints"
    assert descs.shape[1] == 128
    assert descs.dtype == np.uint8
    # most blob centers should have a keypoint nearby
    from scipy.spatial import cKDTree

    tree = cKDTree(kps[:, :2])
    d, _ = tree.query(blob_xy)
    frac = np.mean(d < 3.0)
    assert frac > 0.5, f"only {frac:.2f} of blobs detected"


@pytest.mark.slow
def test_sift_translation_repeatability_and_matching():
    img, _ = make_texture(seed=1)
    dy, dx = 7, 12
    img2 = np.roll(np.roll(img, dy, axis=0), dx, axis=1)
    ex = SiftExtractor(SMALL)
    kp1, d1 = ex.extract(img)
    kp2, d2 = ex.extract(img2)
    assert len(kp1) > 60 and len(kp2) > 60

    from xrsfm_tpu.ops.matching import match_pair_host

    matches, _ = match_pair_host(d1, d2)
    assert len(matches) > 30, f"only {len(matches)} matches"
    delta = kp2[matches[:, 1], :2] - kp1[matches[:, 0], :2]
    err = np.linalg.norm(delta - np.array([dx, dy]), axis=-1)
    inlier_frac = np.mean(err < 2.0)
    assert inlier_frac > 0.7, f"translation-consistent fraction {inlier_frac:.2f}"


def test_extract_batch_matches_single():
    """extract_batch must reproduce per-image extract exactly (same
    jitted pipeline, batched dispatch)."""
    from xrsfm_tpu.ops.sift import SiftExtractor, SiftOptions

    img1, _ = make_texture(h=160, w=192, seed=5, n_blobs=80)
    img2, _ = make_texture(h=160, w=192, seed=6, n_blobs=80)
    ex = SiftExtractor(SiftOptions(
        num_octaves=3, features_per_octave=256, max_features=512,
        first_octave=0,
    ))
    k1, d1 = ex.extract(img1)
    k2, d2 = ex.extract(img2)
    out = ex.extract_batch([img1, img2])
    np.testing.assert_allclose(out[0][0], k1, atol=1e-5)
    np.testing.assert_allclose(out[1][0], k2, atol=1e-5)
    assert np.array_equal(out[0][1], d1)
    assert np.array_equal(out[1][1], d2)
