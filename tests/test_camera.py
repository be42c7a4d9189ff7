import jax.numpy as jnp
import numpy as np
import pytest

from xrsfm_tpu.utils import camera as C
from xrsfm_tpu.utils import geometry as G


RAW_EXAMPLES = [
    (C.SIMPLE_PINHOLE, [500.0, 320.0, 240.0]),
    (C.PINHOLE, [500.0, 510.0, 320.0, 240.0]),
    (C.SIMPLE_RADIAL, [500.0, 320.0, 240.0, 0.08]),
    (C.RADIAL, [500.0, 320.0, 240.0, 0.08, -0.02]),
    (C.OPENCV, [500.0, 510.0, 320.0, 240.0, 0.08, -0.02, 0.001, -0.002]),
]


def test_canonicalize_roundtrip():
    for mid, p in RAW_EXAMPLES:
        canon = C.canonicalize_params(mid, p)
        back = C.raw_params(mid, canon)
        np.testing.assert_allclose(back, p)


def test_pinhole_projection_exact():
    params = jnp.asarray(C.canonicalize_params(C.PINHOLE, [500.0, 510.0, 320.0, 240.0]), jnp.float32)
    uv = jnp.array([[0.1, -0.2], [0.0, 0.0]], jnp.float32)
    xy = C.normalized_to_image(params, uv)
    np.testing.assert_allclose(xy, [[370.0, 138.0], [320.0, 240.0]], atol=1e-4)
    back = C.image_to_normalized(params, xy)
    np.testing.assert_allclose(back, uv, atol=1e-5)


@pytest.mark.parametrize("mid,p", RAW_EXAMPLES)
def test_distort_undistort_roundtrip(mid, p):
    params = jnp.asarray(C.canonicalize_params(mid, p), jnp.float32)
    rng = np.random.default_rng(0)
    uv = jnp.asarray(rng.uniform(-0.3, 0.3, size=(256, 2)), jnp.float32)
    xy = C.normalized_to_image(params, uv)
    uv2 = C.image_to_normalized(params, xy)
    np.testing.assert_allclose(uv2, uv, atol=2e-4)


def test_batched_mixed_cameras():
    cams = C.make_cameras(
        [m for m, _ in RAW_EXAMPLES], [p for _, p in RAW_EXAMPLES]
    )
    assert cams.params.shape == (5, 8)
    uv = jnp.full((5, 2), 0.1, jnp.float32)
    xy = C.normalized_to_image(cams.params, uv)
    assert xy.shape == (5, 2)
    # each row should match the individual camera's projection
    for i, (mid, p) in enumerate(RAW_EXAMPLES):
        params = jnp.asarray(C.canonicalize_params(mid, p), jnp.float32)
        np.testing.assert_allclose(xy[i], C.normalized_to_image(params, uv[i]), atol=1e-5)


def test_project_world_points():
    params = jnp.asarray(C.canonicalize_params(C.SIMPLE_RADIAL, [500.0, 320.0, 240.0, 0.05]), jnp.float32)
    # identity pose, point straight ahead
    q = jnp.array([1.0, 0, 0, 0], jnp.float32)
    t = jnp.zeros(3, jnp.float32)
    xyz = jnp.array([[0.0, 0.0, 2.0], [0.5, -0.5, 5.0]], jnp.float32)
    xy, z = C.project(params, q, t, xyz)
    np.testing.assert_allclose(z, [2.0, 5.0], atol=1e-6)
    np.testing.assert_allclose(xy[0], [320.0, 240.0], atol=1e-4)
    # undistorted ray of second projection must point at the 3d point
    uv = C.image_to_normalized(params, xy[1])
    np.testing.assert_allclose(uv * 5.0, xyz[1, :2], atol=1e-3)
