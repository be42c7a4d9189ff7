"""Error detection on relative poses (reference: ErrorDetector,
src/geometry/error_detector.cc:5-159) — batched consistency path."""

import numpy as np

from xrsfm_tpu.mapper import error_correct as EC
from xrsfm_tpu.mapper import IncrementalMapper, MapperOptions

from synthetic import make_scene
from test_incremental import build_map_from_scene


def _reconstructed_map():
    s = make_scene(n_cams=6, n_pts=150, seed=20, noise=0.0)
    m = build_map_from_scene(s)
    ok = IncrementalMapper(MapperOptions(verbose=False)).reconstruct(m)
    assert ok
    return m


def test_consistent_map_has_no_bad_pairs():
    m = _reconstructed_map()
    opts = EC.ErrorCorrectOptions()
    for f in range(m.num_frames):
        assert EC.registration_is_consistent(m, f, opts)
        # engage_all checks every registered pair
        assert EC.check_all_relative_pose(m, f, opts, engage_all=True) == []


def test_corrupted_pose_detected():
    m = _reconstructed_map()
    opts = EC.ErrorCorrectOptions()
    # corrupt one frame: rotate ~20 degrees and shove the center
    f = 3
    th = np.deg2rad(20.0)
    dq = np.array([np.cos(th / 2), 0.0, np.sin(th / 2), 0.0])
    from xrsfm_tpu.utils import geometry as G

    m.q[f] = G.quat_mul_np(dq, m.q[f])
    m.t[f] = m.t[f] + np.array([1.5, 0.0, 0.0])
    bad = EC.check_all_relative_pose(m, f, opts, engage_all=True)
    assert len(bad) >= 2, bad
    assert not EC.registration_is_consistent(m, f, opts)


def test_batched_stats_match_single():
    m = _reconstructed_map()
    opts = EC.ErrorCorrectOptions()
    pair_list = []
    for pid in range(len(m.pairs)):
        id1, id2, mt = m.pairs[pid]
        if m.registered[id1] and m.registered[id2] and len(mt) >= 8:
            pair_list.append((id1, id2, mt))
    assert len(pair_list) >= 3
    batched = EC._pair_stats_many(m, pair_list, opts)
    for row, (id1, id2, mt) in zip(batched, pair_list):
        single = EC._pair_stats_many(m, [(id1, id2, mt)], opts)[0]
        np.testing.assert_allclose(row[:2], single[:2])  # good/total counts
        np.testing.assert_allclose(row[2], single[2], rtol=1e-5)
