import numpy as np

from xrsfm_tpu.base.snapshot import load_snapshot, save_snapshot
from xrsfm_tpu.mapper import IncrementalMapper, MapperOptions

from synthetic import make_scene
from test_incremental import build_map_from_scene


def test_snapshot_roundtrip_and_resume(tmp_path):
    s = make_scene(n_cams=6, n_pts=150, seed=20, noise=0.0)
    m = build_map_from_scene(s)
    ok = IncrementalMapper(MapperOptions(verbose=False)).reconstruct(m)
    assert ok
    path = str(tmp_path / "snap.npz")
    save_snapshot(m, path)
    m2 = load_snapshot(path)
    assert m2.names == m.names
    np.testing.assert_array_equal(m2.registered, m.registered)
    np.testing.assert_allclose(m2.q, m.q)
    np.testing.assert_allclose(m2.t, m.t)
    assert m2.num_tracks == m.num_tracks
    np.testing.assert_allclose(
        m2.track_xyz[: m2.num_tracks], m.track_xyz[: m.num_tracks]
    )
    for tid in range(m.num_tracks):
        assert m2.track_obs[tid] == m.track_obs[tid]
    # resume path: re-attach the pair graph and rebuild counters
    for id1, id2, matches in m.pairs:
        m2.add_pair(id1, id2, matches)
    m2.build_correspondence_graph()
    m2.rebuild_visibility_counters()
    for f in range(m.num_frames):
        np.testing.assert_array_equal(m2.p3d_corr_cnt[f], m.p3d_corr_cnt[f])
    # a resumed map should be usable by the mapper queries
    p2d, tids = m2.search_correspondences(0)
    assert len(p2d) > 0


def test_midrun_checkpoint_then_resume(tmp_path):
    """Bounded run + snapshot, then restore_into a fresh map and finish:
    the resumed reconstruction must register every frame and skip
    re-initialization."""
    from xrsfm_tpu.base.snapshot import restore_into

    s = make_scene(n_cams=6, n_pts=150, seed=20, noise=0.0)
    path = str(tmp_path / "mid.npz")

    m1 = build_map_from_scene(s)
    opts = MapperOptions(verbose=False, snapshot_every=1,
                         snapshot_path=path, max_registrations=2)
    ok = IncrementalMapper(opts).reconstruct(m1)
    assert ok
    n1 = int(np.count_nonzero(m1.registered))
    assert 3 <= n1 < 6  # init pair + 2 registrations, stopped early

    m2 = build_map_from_scene(s)
    restore_into(m2, path)
    assert int(np.count_nonzero(m2.registered)) >= 3
    log = []

    class _Mapper(IncrementalMapper):
        def _log(self, msg):
            log.append(msg)

    ok = _Mapper(MapperOptions(verbose=False)).reconstruct(m2)
    assert ok
    assert int(np.count_nonzero(m2.registered)) == 6
    assert any("resuming" in msg for msg in log), log


def test_restore_into_rejects_other_dataset(tmp_path):
    import pytest

    from xrsfm_tpu.base.snapshot import restore_into

    s = make_scene(n_cams=6, n_pts=150, seed=20, noise=0.0)
    m = build_map_from_scene(s)
    ok = IncrementalMapper(MapperOptions(verbose=False)).reconstruct(m)
    assert ok
    path = str(tmp_path / "snap.npz")
    save_snapshot(m, path)
    other = build_map_from_scene(make_scene(n_cams=5, n_pts=100, seed=3))
    with pytest.raises(ValueError):
        restore_into(other, path)
