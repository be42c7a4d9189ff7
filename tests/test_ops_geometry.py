import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xrsfm_tpu.ops import poly, triangulation as T, epipolar as E, pnp as P
from xrsfm_tpu.utils import geometry as G
from synthetic import make_scene


# ---------------------------------------------------------------- poly

def test_poly_roots_cubic():
    # (x-1)(x-2)(x-3) = x^3 - 6x^2 + 11x - 6
    roots, valid = poly.real_roots(jnp.array([1.0, -6.0, 11.0, -6.0]))
    assert bool(valid.all())
    np.testing.assert_allclose(np.sort(np.asarray(roots)), [1, 2, 3], atol=1e-3)


def test_poly_roots_quartic_complex_pair():
    # (x^2+1)(x-2)(x+3) = x^4 + x^3 - 5x^2 + x - 6
    roots, valid = poly.real_roots(jnp.array([1.0, 1.0, -5.0, 1.0, -6.0]))
    rr = np.sort(np.asarray(roots)[np.asarray(valid)])
    np.testing.assert_allclose(rr, [-3, 2], atol=1e-3)


def test_poly_roots_batched():
    coeffs = jnp.array([[1.0, -3.0, 2.0], [1.0, 0.0, -4.0]])  # (x-1)(x-2); x^2-4
    roots, valid = poly.real_roots(coeffs)
    assert roots.shape == (2, 2)
    np.testing.assert_allclose(np.sort(np.asarray(roots[0])), [1, 2], atol=1e-3)
    np.testing.assert_allclose(np.sort(np.asarray(roots[1])), [-2, 2], atol=1e-3)


# ---------------------------------------------------------------- triangulation

def test_triangulate_two_view_exact():
    s = make_scene(n_cams=2, n_pts=64, seed=1)
    X = T.triangulate_two_view(
        jnp.asarray(s["q"][0]), jnp.asarray(s["t"][0]), jnp.asarray(s["uv"][0]),
        jnp.asarray(s["q"][1]), jnp.asarray(s["t"][1]), jnp.asarray(s["uv"][1]),
    )
    np.testing.assert_allclose(X, s["xyz"], atol=5e-3)


def test_triangulate_multiview_masked():
    s = make_scene(n_cams=5, n_pts=32, seed=2)
    V, Pn = 5, 32
    q = jnp.asarray(np.broadcast_to(s["q"], (Pn, V, 4)))
    t = jnp.asarray(np.broadcast_to(s["t"], (Pn, V, 3)))
    uv = jnp.asarray(np.moveaxis(s["uv"], 0, 1))  # [P, V, 2]
    mask = np.ones((Pn, V), np.float32)
    mask[:, 3:] = 0.0  # only first 3 views valid; garbage in the rest
    uv_bad = uv.at[:, 3:].set(99.0)
    X = T.triangulate_multiview(q, t, uv_bad, jnp.asarray(mask))
    np.testing.assert_allclose(X, s["xyz"], atol=5e-3)


def test_reprojection_and_angle():
    s = make_scene(n_cams=2, n_pts=16, seed=3)
    err = T.reprojection_errors(
        jnp.asarray(s["q"][0]), jnp.asarray(s["t"][0]),
        jnp.asarray(s["uv"][0]), jnp.asarray(s["xyz"]),
    )
    assert float(jnp.max(err)) < 1e-8
    c1 = G.pose_center(jnp.asarray(s["q"][0]), jnp.asarray(s["t"][0]))
    c2 = G.pose_center(jnp.asarray(s["q"][1]), jnp.asarray(s["t"][1]))
    ang = T.triangulation_angle(c1, c2, jnp.asarray(s["xyz"]))
    assert float(jnp.min(ang)) > np.deg2rad(2.0)


# ---------------------------------------------------------------- epipolar

def _gt_F(s, K=None):
    """F between cam0 and cam1 from GT poses (normalized coords: F == E)."""
    q1, t1 = jnp.asarray(s["q"][0]), jnp.asarray(s["t"][0])
    q2, t2 = jnp.asarray(s["q"][1]), jnp.asarray(s["t"][1])
    qr, tr = G.pose_relative(q2, t2, q1, t1)  # T21
    return E.essential_from_pose(qr, tr)


def test_sampson_zero_on_clean():
    s = make_scene(n_cams=2, n_pts=64, seed=4)
    Egt = _gt_F(s)
    err = E.sampson_error(Egt, jnp.asarray(s["uv"][0]), jnp.asarray(s["uv"][1]))
    assert float(jnp.max(err)) < 1e-8


def test_essential_8pt_recovers():
    s = make_scene(n_cams=2, n_pts=64, seed=5)
    x1 = jnp.asarray(s["uv"][0])
    x2 = jnp.asarray(s["uv"][1])
    Eest, valid = E.essential_8pt(x1, x2, jnp.ones(64, bool))
    assert bool(valid)
    err = E.sampson_error(Eest, x1, x2)
    assert float(jnp.max(err)) < 1e-7


def test_fundamental_8pt_pixels():
    s = make_scene(n_cams=2, n_pts=64, seed=6)
    f = 500.0
    x1 = jnp.asarray(s["uv"][0] * f + np.array([320, 240]))
    x2 = jnp.asarray(s["uv"][1] * f + np.array([320, 240]))
    F, valid = E.fundamental_8pt(x1, x2, jnp.ones(64, bool))
    assert bool(valid)
    err = E.sampson_error(F, x1, x2)
    assert float(jnp.max(err)) < 1e-2  # pixels^2


def test_fundamental_7pt_contains_solution():
    s = make_scene(n_cams=2, n_pts=64, seed=7)
    f = 500.0
    y1 = jnp.asarray(s["uv"][0] * f + np.array([320, 240]))
    y2 = jnp.asarray(s["uv"][1] * f + np.array([320, 240]))
    # estimate from the first 7 points, evaluate on all 64
    x1, x2 = y1[:7], y2[:7]
    Fs, valid = E.fundamental_7pt(x1, x2, jnp.ones(7, bool))
    errs = jax.vmap(lambda F: jnp.max(E.sampson_error(F, y1, y2)))(Fs)
    errs = jnp.where(valid, errs, jnp.inf)
    assert float(jnp.min(errs)) < 1e-1


def test_recover_pose_from_essential():
    s = make_scene(n_cams=2, n_pts=64, seed=8)
    x1 = jnp.asarray(s["uv"][0])
    x2 = jnp.asarray(s["uv"][1])
    Eest, _ = E.essential_8pt(x1, x2, jnp.ones(64, bool))
    q, t, n_good, _ = E.recover_pose_from_essential(Eest, x1, x2, jnp.ones(64, bool))
    assert int(n_good) >= 60
    # compare against GT relative pose (translation up to scale)
    q1, t1 = jnp.asarray(s["q"][0]), jnp.asarray(s["t"][0])
    q2, t2 = jnp.asarray(s["q"][1]), jnp.asarray(s["t"][1])
    qgt, tgt = G.pose_relative(q2, t2, q1, t1)
    dq = G.quat_mul(G.quat_conj(qgt), q)
    ang = float(jnp.linalg.norm(G.so3_log(dq)))
    assert ang < 1e-2
    tdir = t / jnp.linalg.norm(t)
    tgtdir = tgt / jnp.linalg.norm(tgt)
    assert float(jnp.abs(jnp.dot(tdir, tgtdir))) > 0.999


# ---------------------------------------------------------------- pnp

def test_p3p_recovers_pose():
    s = make_scene(n_cams=1, n_pts=3, seed=9)
    q, t, valid = P.p3p(jnp.asarray(s["xyz"]), jnp.asarray(s["uv"][0]))
    qgt, tgt = jnp.asarray(s["q"][0]), jnp.asarray(s["t"][0])
    errs = []
    for i in range(4):
        if not bool(valid[i]):
            errs.append(np.inf)
            continue
        dq = G.quat_mul(G.quat_conj(qgt), q[i])
        errs.append(float(jnp.linalg.norm(G.so3_log(dq))) + float(jnp.linalg.norm(t[i] - tgt)))
    assert min(errs) < 1e-3


def test_refine_pose_converges():
    s = make_scene(n_cams=1, n_pts=50, seed=10)
    qgt, tgt = jnp.asarray(s["q"][0]), jnp.asarray(s["t"][0])
    # perturb
    q0, t0 = G.pose_retract(qgt, tgt, jnp.asarray(np.r_[0.05, -0.04, 0.03, 0.1, -0.1, 0.08], np.float32))
    q, t = P.refine_pose(
        q0, t0, jnp.asarray(s["uv"][0]), jnp.asarray(s["xyz"]),
        jnp.ones(50, jnp.float32), iters=15,
    )
    dq = G.quat_mul(G.quat_conj(qgt), q)
    assert float(jnp.linalg.norm(G.so3_log(dq))) < 1e-3
    assert float(jnp.linalg.norm(t - tgt)) < 1e-3


def test_essential_5pt_contains_solution():
    from xrsfm_tpu.ops.essential5pt import essential_5pt

    s = make_scene(n_cams=2, n_pts=64, seed=11)
    x1 = jnp.asarray(s["uv"][0])
    x2 = jnp.asarray(s["uv"][1])
    mask = jnp.zeros(64, bool).at[:5].set(True)
    Es, valid = essential_5pt(x1, x2, mask)
    assert Es.shape == (10, 3, 3)
    errs = jax.vmap(lambda Em: jnp.max(E.sampson_error(Em, x1, x2)))(Es)
    errs = jnp.where(valid, errs, jnp.inf)
    best = float(jnp.min(errs))
    assert best < 1e-6, f"no 5pt solution matches GT (best max-sampson {best})"


def test_essential_5pt_vmapped_over_samples():
    from xrsfm_tpu.ops.essential5pt import essential_5pt

    s = make_scene(n_cams=2, n_pts=40, seed=12)
    x1 = jnp.asarray(s["uv"][0])
    x2 = jnp.asarray(s["uv"][1])
    idx = jnp.asarray(np.stack([np.arange(5), np.arange(5, 10), np.arange(10, 15)]))
    f = jax.vmap(
        lambda ii: essential_5pt(x1[ii], x2[ii], jnp.ones(5, bool))
    )
    Es, valid = f(idx)
    assert Es.shape == (3, 10, 3, 3)
    for b in range(3):
        errs = jax.vmap(lambda Em: jnp.max(E.sampson_error(Em, x1, x2)))(Es[b])
        errs = jnp.where(valid[b], errs, jnp.inf)
        assert float(jnp.min(errs)) < 1e-5
