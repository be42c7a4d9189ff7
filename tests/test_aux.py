"""Aux subsystems: JSON config, profiler helpers, determinism checksums
(SURVEY.md §5.1/§5.2/§5.6)."""

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xrsfm_tpu.parallel.checksum import array_checksum, pytree_checksum
from xrsfm_tpu.utils import config as C
from xrsfm_tpu.utils.profiling import device_time, maybe_trace


# --- config -----------------------------------------------------------


def _ns(**kw):
    return argparse.Namespace(**kw)


def test_config_reference_keys_run_reconstruction(tmp_path):
    """config_seq.json-style file (reference run_reconstruction.cc:55-64)."""
    cfg = tmp_path / "config_seq.json"
    cfg.write_text(json.dumps({
        "bin_path": "/x/bins",
        "camera_path": "/x/camera.txt",
        "output_path": "/x/out",
        "init_id1": 3,
        "init_id2": 7,
    }))
    a = _ns(bin_dir=None, camera_txt=None, output_dir=None,
            init_id1=-1, init_id2=-1)
    C.resolve("run_reconstruction", a, str(cfg))
    assert a.bin_dir == "/x/bins"
    assert a.camera_txt == "/x/camera.txt"
    assert a.output_dir == "/x/out"
    assert (a.init_id1, a.init_id2) == (3, 7)


def test_config_cli_overrides_json(tmp_path):
    cfg = tmp_path / "c.json"
    cfg.write_text(json.dumps({
        "images_path": "/json/images", "retrieval_path": "/json/r.txt",
        "matching_type": "retrieval", "output_path": "/json/out",
    }))
    a = _ns(images_dir="/cli/images", retrieval_path=None,
            matching_type=None, output_dir=None)
    C.resolve("run_matching", a, str(cfg))
    assert a.images_dir == "/cli/images"  # CLI wins
    assert a.matching_type == "retrieval"


def test_config_file_valued_bin_path_maps_to_dir(tmp_path):
    """config_tri.json points at images.bin / *.bin files
    (reference run_triangulation.cc:117-125); we take their dirs."""
    cfg = tmp_path / "config_tri.json"
    cfg.write_text(json.dumps({
        "bin_path": "/m/refine/images.bin",
        "feature_path": "/w/bins/ftr.bin",
        "matches_path": "/w/bins/fp.bin",
        "output_path": "/w/out",
    }))
    a = _ns(bin_dir=None, model_dir=None, output_dir=None)
    C.resolve("run_triangulation", a, str(cfg))
    assert a.bin_dir == "/w/bins"
    assert a.model_dir == "/m/refine"


def test_config_missing_raises():
    a = _ns(bin_dir=None, camera_txt=None, output_dir=None,
            init_id1=-1, init_id2=-1)
    with pytest.raises(SystemExit):
        C.resolve("run_reconstruction", a, None)


# --- profiling --------------------------------------------------------


def test_device_time_runs():
    f = jax.jit(lambda x: (x * 2.0).sum())
    t, out = device_time(f, jnp.ones(64), warmup=1, iters=3)
    assert t >= 0.0 and float(out) == 128.0


def test_maybe_trace_noop():
    with maybe_trace(None):
        pass


# --- checksums --------------------------------------------------------


def test_checksum_sharding_invariant():
    """The same values give the same checksum replicated or sharded
    over the 8-device mesh (uint32 sums are exactly commutative)."""
    x = np.arange(4096, dtype=np.float32) * 0.37
    mesh = Mesh(np.array(jax.devices()), axis_names=("d",))
    sharded = jax.device_put(x, NamedSharding(mesh, P("d")))
    plain = jnp.asarray(x)
    assert int(array_checksum(plain)) == int(array_checksum(sharded))


def test_checksum_detects_bitflip():
    x = np.arange(512, dtype=np.float32)
    y = x.copy()
    y[317] = np.nextafter(y[317], np.inf)  # 1-ulp change
    assert int(array_checksum(jnp.asarray(x))) != int(
        array_checksum(jnp.asarray(y))
    )


def test_checksum_position_sensitive():
    x = np.array([1.0, 2.0], np.float32)
    y = np.array([2.0, 1.0], np.float32)
    assert int(array_checksum(jnp.asarray(x))) != int(
        array_checksum(jnp.asarray(y))
    )


def test_pytree_checksum_distinguishes_paths():
    a = {"q": jnp.ones(8), "t": jnp.zeros(8)}
    b = {"q": jnp.zeros(8), "t": jnp.ones(8)}
    assert pytree_checksum(a) != pytree_checksum(b)
    assert pytree_checksum(a) == pytree_checksum(
        {"q": jnp.ones(8), "t": jnp.zeros(8)}
    )


def test_checksum_int_and_bool_dtypes():
    assert int(array_checksum(jnp.arange(16, dtype=jnp.int32))) != 0
    assert int(array_checksum(jnp.ones(16, bool))) != int(
        array_checksum(jnp.zeros(16, bool))
    )


def test_write_trajectory_inverts_tcw(tmp_path):
    """write_trajectory emits world-from-camera poses: q_wc = conj(q_cw),
    center = -R^T t (reference: WriteTrajectory, io_ecim.hpp:108-122)."""
    import numpy as np
    from xrsfm_tpu.base.map import SfMMap
    from xrsfm_tpu.base.colmap_bridge import write_trajectory

    rng = np.random.default_rng(7)
    m = SfMMap()
    m.add_camera(0, 1, [500.0, 500.0, 320.0, 240.0], 640, 480)
    qs, ts = [], []
    for i in range(3):
        f = m.add_frame(f"im{i}.png", 0, np.zeros((1, 2)))
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        t = rng.normal(size=3)
        m.q[f] = q
        m.t[f] = t
        m.registered[f] = True
        qs.append(q)
        ts.append(t)
    path = str(tmp_path / "traj.txt")
    write_trajectory(m, path, timestamps=[0.0, 1.0, 2.0])
    lines = open(path).read().strip().splitlines()
    assert len(lines) == 3
    for q, t, line in zip(qs, ts, lines):
        vals = np.array([float(v) for v in line.split()])
        c_file = vals[1:4]
        q_file = np.array([vals[7], vals[4], vals[5], vals[6]])  # wxyz
        w, x, y, z = q
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        np.testing.assert_allclose(c_file, -R.T @ t, atol=1e-9)
        expect_q = q * np.array([1, -1, -1, -1])
        if expect_q[0] * q_file[0] < 0:
            expect_q = -expect_q
        np.testing.assert_allclose(q_file, expect_q, atol=1e-9)


def test_pointcloud_colorizer(tmp_path):
    """Reference: scripts/pointcloud_color_calculator.py:8-45 — average
    the image pixels under each track's observations into points3D rgb."""
    cv2 = pytest.importorskip("cv2")
    import os
    import sys

    from xrsfm_tpu.utils import io_colmap as IOC

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "scripts"))
    try:
        from pointcloud_color import add_color
    finally:
        sys.path.pop(0)

    imgd = tmp_path / "images"
    imgd.mkdir()
    img = np.zeros((100, 100, 3), np.uint8)
    img[:, :, 2] = 200  # BGR -> red 200
    img[10, 20] = (10, 30, 250)
    cv2.imwrite(str(imgd / "a.png"), img)
    model = tmp_path / "model"
    model.mkdir()
    ims = {1: IOC.ColmapImage(
        1, np.array([1.0, 0, 0, 0]), np.zeros(3), 0, "a.png",
        np.array([[20.0, 10.0], [50.0, 50.0]]), np.array([7, 9], np.int64))}
    pts = {
        7: IOC.ColmapPoint3D(7, np.zeros(3), np.zeros(3, np.uint8), 0.1,
                             np.array([1], np.int32), np.array([0], np.int32)),
        9: IOC.ColmapPoint3D(9, np.ones(3), np.zeros(3, np.uint8), 0.1,
                             np.array([1], np.int32), np.array([1], np.int32)),
    }
    IOC.write_images_bin(str(model / "images.bin"), ims)
    IOC.write_points3d_bin(str(model / "points3D.bin"), pts)
    assert add_color(str(imgd), str(model)) == 2
    out = IOC.read_points3d_bin(str(model / "points3D.bin"))
    assert out[7].rgb[0] == 250 and out[7].rgb[1] == 30
    assert out[9].rgb[0] == 200 and out[9].rgb[2] == 0
