"""End-to-end incremental SfM on a synthetic scene.

Plays the role of the reference's test_data smoke test (SURVEY.md §4): the
matching stage output is simulated exactly (known correspondences with
shuffled per-frame feature order + outliers), and the reconstruction is
checked against ground truth with Umeyama-aligned ATE.
"""

import numpy as np
import pytest

from xrsfm_tpu.base.map import SfMMap
from xrsfm_tpu.mapper import IncrementalMapper, MapperOptions
from xrsfm_tpu.ops.umeyama import ate_rmse
from xrsfm_tpu.utils import camera as C
from xrsfm_tpu.utils import geometry as G

from synthetic import make_scene


def build_map_from_scene(s, f=500.0, cx=320.0, cy=240.0, window=3,
                         noise_px=0.3, outlier_frac=0.03, seed=0):
    rng = np.random.default_rng(seed)
    n_cams, n_pts = s["uv"].shape[:2]
    m = SfMMap()
    m.add_camera(0, C.PINHOLE, [f, f, cx, cy], 640, 480)
    perms = []
    for i in range(n_cams):
        uv_px = s["uv"][i] * f + np.array([cx, cy], np.float32)
        uv_px = uv_px + rng.normal(scale=noise_px, size=uv_px.shape)
        perm = rng.permutation(n_pts)
        perms.append(np.argsort(perm))  # point k -> feature index
        m.add_frame(f"img{i:04d}.png", 0, uv_px[perm].astype(np.float32))
    for i in range(n_cams):
        for j in range(i + 1, min(i + 1 + window, n_cams)):
            pts = np.arange(n_pts)
            idx_i = perms[i][pts]
            idx_j = perms[j][pts]
            matches = np.stack([idx_i, idx_j], axis=1).astype(np.int32)
            # inject a few wrong matches to exercise robustness
            n_out = int(outlier_frac * len(matches))
            if n_out:
                rows = rng.choice(len(matches), n_out, replace=False)
                matches[rows, 1] = rng.integers(0, n_pts, n_out)
            m.add_pair(i, j, matches)
    m.build_correspondence_graph()
    return m


@pytest.mark.slow
def test_incremental_reconstruction_synthetic():
    s = make_scene(n_cams=6, n_pts=150, seed=20, noise=0.0)
    m = build_map_from_scene(s)
    mapper = IncrementalMapper(MapperOptions(verbose=True))
    ok = mapper.reconstruct(m)
    assert ok, "initialization failed"
    assert int(np.count_nonzero(m.registered)) == 6, (
        f"only {np.count_nonzero(m.registered)} frames registered"
    )
    # ATE vs ground truth after similarity alignment
    import jax.numpy as jnp

    est_centers = np.asarray(
        G.pose_center(jnp.asarray(m.q, jnp.float32), jnp.asarray(m.t, jnp.float32))
    )
    gt_centers = np.asarray(
        G.pose_center(jnp.asarray(s["q"]), jnp.asarray(s["t"]))
    )
    ate = ate_rmse(gt_centers, est_centers)
    # scene scale ~8 (cameras on radius-4 arc): demand sub-percent ATE
    assert ate < 0.05, f"ATE {ate}"
    # most points should be in tracks
    assert int(np.count_nonzero(m.track_valid)) > 100


def test_retriangulate_repairs_corrupted_points():
    from xrsfm_tpu.mapper import triangulate as TRI

    s = make_scene(n_cams=6, n_pts=150, seed=20, noise=0.0)
    m = build_map_from_scene(s)
    ok = IncrementalMapper(MapperOptions(verbose=False)).reconstruct(m)
    assert ok
    # corrupt a handful of track positions
    rng = np.random.default_rng(0)
    valid = np.nonzero(m.track_valid[: m.num_tracks])[0]
    victims = valid[:20]
    before = m.track_xyz[victims].copy()
    m.track_xyz[victims] += rng.normal(scale=0.5, size=(len(victims), 3))
    n_upd = TRI.retriangulate(m, victims)
    assert n_upd >= 15
    err = np.linalg.norm(m.track_xyz[victims] - before, axis=1)
    assert np.median(err) < 0.02, np.median(err)


def test_initialize_narrow_baseline():
    """Video-like motion: every pair's triangulation angles sit in the
    low single digits, so the reference's 16/8-deg gates can never pass;
    the relaxed angle ladder must still find an init pair
    (mapper/initialize.py)."""
    from xrsfm_tpu.mapper import initialize as I
    from synthetic import look_at, rotmat_to_quat_np

    rng = np.random.default_rng(5)
    n_cams, n_pts = 4, 300
    xyz = np.concatenate(
        [rng.uniform(-2, 2, (n_pts, 2)), rng.uniform(4.5, 5.5, (n_pts, 1))],
        axis=1,
    )
    qs, ts, uvs = [], [], []
    for i in range(n_cams):
        center = np.array([0.2 * i, 0.0, 0.0])  # ~2.3 deg adjacent at z~5
        R = look_at(center, center + np.array([0.0, 0.0, 1.0]))
        t = -R @ center
        pc = xyz @ R.T + t
        qs.append(rotmat_to_quat_np(R))
        ts.append(t)
        uvs.append(pc[:, :2] / pc[:, 2:3])
    s = dict(
        q=np.asarray(qs, np.float32), t=np.asarray(ts, np.float32),
        xyz=xyz, uv=np.stack(uvs),
    )
    m = build_map_from_scene(s, noise_px=0.1, outlier_frac=0.02)
    ok = I.find_and_initialize(m)
    assert ok, "narrow-baseline initialization failed"
    assert int(np.count_nonzero(m.registered)) == 2


def _full_map_state(m):
    """Every piece of public map state, deep-copied, for bit-identity
    comparison around the polish trial gate."""
    import copy

    nt = m.num_tracks
    return dict(
        q=m.q.copy(), t=m.t.copy(),
        xyz=m.track_xyz[:nt].copy(), valid=m.track_valid[:nt].copy(),
        err=m.track_error[:nt].copy(), ang=m.track_angle[:nt].copy(),
        cameras={c: np.array(p) for c, p in m.cameras.items()},
        camera_models={
            c: (mid, np.array(raw), w, h)
            for c, (mid, raw, w, h) in m.camera_models.items()
        },
        kps_norm=[k.copy() for k in m.kps_norm],
        registered=m.registered.copy(),
        registered_fail=m.registered_fail.copy(),
        obs_track=m.obs_track[: m.num_obs_slots].copy(),
        num_obs=m.num_obs_slots,
        num_tracks=nt,
        track_obs=copy.deepcopy(m.track_obs),
        track_of=np.concatenate(m.track_of).copy(),
        p3d_cnt=np.concatenate(m.p3d_corr_cnt).copy(),
    )


def test_polish_revert_is_lossless():
    """A REVERTED global-polish trial must leave the map bit-identical
    to the pre-trial snapshot (r3 verdict weak#8).  The trial mutates:
    poses (the rewrite touches only m.q/m.t — asserted by inspection of
    optim/global_pose.py:231 / optim/rot_avg.py:400-401, simulated here
    by a direct perturbation), track geometry (retriangulate), and
    poses+points+cameras(+kps_norm) via an intrinsics-refining GBA."""
    from xrsfm_tpu.mapper import ba_glue, incremental
    from xrsfm_tpu.mapper import triangulate as TRI
    from xrsfm_tpu.optim.ba import BAOptions

    s = make_scene(n_cams=8, n_pts=120, seed=3, noise=0.0)
    f, cx, cy = 500.0, 320.0, 240.0
    m = SfMMap()
    m.add_camera(0, C.PINHOLE, [f, f, cx, cy], 640, 480)
    for i in range(8):
        uv_px = s["uv"][i] * f + np.array([cx, cy], np.float32)
        m.add_frame(f"img{i:04d}.png", 0, uv_px.astype(np.float32))
    idx = np.arange(120, dtype=np.int32)
    for i in range(8):
        for j in range(i + 1, min(i + 4, 8)):
            m.add_pair(i, j, np.stack([idx, idx], axis=1))
    m.build_correspondence_graph()
    m.q[:] = s["q"]
    m.t[:] = s["t"]
    m.registered[:] = True
    m.init_id1, m.init_id2 = 0, 1
    rng = np.random.default_rng(11)
    for k in range(120):
        tid = m.new_track(s["xyz"][k] + rng.normal(scale=0.01, size=3))
        for i in range(8):
            m.add_observation(tid, i, k)

    snap = _full_map_state(m)
    backup = incremental.polish_backup(m)

    # --- the trial: pose rewrite stand-in + retriangulate + GBA rounds
    m.q[:, 1:] += rng.normal(scale=0.01, size=(8, 3))
    m.q /= np.linalg.norm(m.q, axis=1, keepdims=True)
    m.t += rng.normal(scale=0.02, size=m.t.shape)
    TRI.retriangulate(
        m, np.nonzero(m.track_valid[: m.num_tracks])[0], TRI.TriOptions()
    )
    ba_glue.run_ba(
        m, list(range(8)), BAOptions(max_iters=3),
        optimize_intrinsics=True,
    )
    assert not np.array_equal(m.q, snap["q"])  # the trial really mutated

    incremental.polish_restore(m, backup)
    post = _full_map_state(m)
    for key in snap:
        a, b = snap[key], post[key]
        if isinstance(a, dict):
            assert a.keys() == b.keys(), key
            for c in a:
                if key == "camera_models":
                    assert a[c][0] == b[c][0] and a[c][2:] == b[c][2:], key
                    assert np.array_equal(a[c][1], b[c][1]), key
                elif key == "cameras":
                    assert np.array_equal(a[c], b[c]), key
        elif isinstance(a, list):
            if key == "track_obs":
                assert a == b, key
            else:
                assert all(np.array_equal(x, y) for x, y in zip(a, b)), key
        elif isinstance(a, np.ndarray):
            assert np.array_equal(a, b), key
        else:
            assert a == b, key
