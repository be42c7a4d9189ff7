import numpy as np
import pytest

from xrsfm_tpu.utils import io_features as IOF
from xrsfm_tpu.utils import native


def _sample_features(n_frames=4, seed=0):
    rng = np.random.default_rng(seed)
    return [
        IOF.FrameFeatures(
            name=f"im_{i:03d}.jpg",
            keypoints=rng.uniform(0, 640, size=(rng.integers(5, 60), 4)).astype(np.float32),
            descriptors=rng.integers(0, 255, size=(1, 128), dtype=np.uint8).repeat(1, 0),
        )
        for i in range(n_frames)
    ]


def test_native_builds():
    assert native.get_native() is not None, "native extension failed to build"


def test_native_read_features_matches_python(tmp_path):
    rng = np.random.default_rng(1)
    feats = []
    for i in range(5):
        n = int(rng.integers(3, 80))
        feats.append(
            IOF.FrameFeatures(
                name=f"img{i}.png",
                keypoints=rng.uniform(0, 640, size=(n, 4)).astype(np.float32),
                descriptors=rng.integers(0, 255, size=(n, 128), dtype=np.uint8),
            )
        )
    p = str(tmp_path / "ftr.bin")
    IOF.write_features(p, feats)
    py = IOF.read_features(p)
    nat = native.read_features_fast(p)
    assert len(py) == len(nat)
    for a, b in zip(py, nat):
        assert a.name == b.name
        np.testing.assert_array_equal(a.keypoints, b.keypoints)
        np.testing.assert_array_equal(a.descriptors, b.descriptors)


def test_native_read_frame_pairs_matches_python(tmp_path):
    rng = np.random.default_rng(2)
    pairs = []
    for k in range(6):
        n = int(rng.integers(4, 50))
        pairs.append(
            IOF.FramePairData(
                id1=k, id2=k + 1,
                matches=rng.integers(0, 100, size=(n, 2)).astype(np.int32),
                distances=rng.uniform(size=n),
                E=rng.normal(size=(3, 3)),
                inlier_num=n // 2,
                inlier_mask=rng.uniform(size=n) > 0.5,
            )
        )
    # include a self-pair that readers must drop
    pairs.append(
        IOF.FramePairData(
            id1=9, id2=9, matches=np.zeros((2, 2), np.int32),
            distances=np.zeros(2), E=np.eye(3), inlier_num=0,
            inlier_mask=np.zeros(2, bool),
        )
    )
    p = str(tmp_path / "fp.bin")
    IOF.write_frame_pairs(p, pairs)
    py = IOF.read_frame_pairs(p)
    nat = native.read_frame_pairs_fast(p)
    assert len(py) == len(nat) == 6
    for a, b in zip(py, nat):
        assert (a.id1, a.id2, a.inlier_num) == (b.id1, b.id2, b.inlier_num)
        np.testing.assert_array_equal(a.matches, b.matches)
        np.testing.assert_allclose(a.distances, b.distances)
        np.testing.assert_allclose(a.E, b.E)
        np.testing.assert_array_equal(a.inlier_mask, b.inlier_mask)
