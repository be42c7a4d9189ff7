import dataclasses

import jax.numpy as jnp
import numpy as np

from xrsfm_tpu.optim.ba import BAProblem, BAOptions, solve_ba, _residuals_only
from xrsfm_tpu.utils import camera as C
from xrsfm_tpu.utils import geometry as G
from synthetic import make_scene


def build_problem(n_cams=6, n_pts=120, noise_px=0.3, seed=0, drop=0.0):
    s = make_scene(n_cams=n_cams, n_pts=n_pts, seed=seed)
    rng = np.random.default_rng(seed + 100)
    f, cx, cy = 500.0, 320.0, 240.0
    intri = np.tile(
        C.canonicalize_params(C.PINHOLE, [f, f, cx, cy]), (n_cams, 1)
    ).astype(np.float32)

    uv_px = s["uv"] * f + np.array([cx, cy], np.float32)
    uv_px += rng.normal(scale=noise_px, size=uv_px.shape)

    cam_idx = np.repeat(np.arange(n_cams), n_pts).astype(np.int32)
    pt_idx = np.tile(np.arange(n_pts), n_cams).astype(np.int32)
    obs_uv = uv_px.reshape(-1, 2).astype(np.float32)
    obs_w = np.ones(len(cam_idx), np.float32)
    if drop > 0:
        obs_w *= (rng.uniform(size=len(cam_idx)) > drop).astype(np.float32)

    fix_cam = np.zeros(n_cams, bool)
    fix_cam[0] = True  # gauge: freeze first camera
    fix_trans = np.zeros(n_cams, bool)
    fix_trans[1] = True  # and second translation (scale gauge)

    return (
        BAProblem(
            cam_q=jnp.asarray(s["q"]),
            cam_t=jnp.asarray(s["t"]),
            cam_intri=jnp.asarray(intri),
            points=jnp.asarray(s["xyz"]),
            obs_uv=jnp.asarray(obs_uv),
            obs_cam=jnp.asarray(cam_idx),
            obs_pt=jnp.asarray(pt_idx),
            obs_w=jnp.asarray(obs_w),
            fix_cam=jnp.asarray(fix_cam),
            fix_trans=jnp.asarray(fix_trans),
            fix_pt=jnp.zeros(n_pts, bool),
        ),
        s,
    )


def perturb(p: BAProblem, scale_rot=0.02, scale_t=0.05, scale_pt=0.05, seed=1):
    rng = np.random.default_rng(seed)
    n_cams = p.cam_q.shape[0]
    delta = np.concatenate(
        [
            rng.normal(scale=scale_rot, size=(n_cams, 3)),
            rng.normal(scale=scale_t, size=(n_cams, 3)),
        ],
        axis=1,
    ).astype(np.float32)
    delta[0] = 0  # keep gauge frames clean
    delta[1, 3:] = 0  # cam1 translation is a frozen gauge anchor
    q2, t2 = G.pose_retract(p.cam_q, p.cam_t, jnp.asarray(delta))
    pts2 = p.points + jnp.asarray(
        rng.normal(scale=scale_pt, size=p.points.shape).astype(np.float32)
    )
    return dataclasses.replace(p, cam_q=q2, cam_t=t2, points=pts2)


def rms_px(p: BAProblem):
    r, z = _residuals_only(p)
    m = p.obs_w > 0
    return float(
        jnp.sqrt(jnp.sum(jnp.sum(r * r, -1) * m) / jnp.maximum(jnp.sum(m), 1))
    )


def test_ba_reduces_cost_to_noise_floor():
    p0, s = build_problem(noise_px=0.3)
    p_bad = perturb(p0)
    assert rms_px(p_bad) > 5.0
    p_opt, info = solve_ba(p_bad, BAOptions(max_iters=25, huber_px=4.0))
    final_rms = rms_px(p_opt)
    # noise floor is ~0.3*sqrt(2) px
    assert final_rms < 0.6, f"rms {final_rms}"
    assert float(info["final_cost"]) < float(info["initial_cost"]) * 0.01


def test_ba_noiseless_exact_recovery():
    p0, s = build_problem(noise_px=0.0, seed=3)
    p_bad = perturb(p0, seed=4)
    p_opt, _ = solve_ba(p_bad, BAOptions(max_iters=30, huber_px=4.0))
    assert rms_px(p_opt) < 1e-2
    # camera centers should match GT (gauge is fully pinned by cam0 pose +
    # cam1 translation)
    c_gt = G.pose_center(p0.cam_q, p0.cam_t)
    c_opt = G.pose_center(p_opt.cam_q, p_opt.cam_t)
    np.testing.assert_allclose(c_opt, c_gt, atol=2e-2)


def test_ba_respects_gauge_fixing():
    p0, _ = build_problem(noise_px=0.2, seed=5)
    p_bad = perturb(p0, seed=6)
    p_opt, _ = solve_ba(p_bad, BAOptions(max_iters=10))
    np.testing.assert_allclose(p_opt.cam_q[0], p_bad.cam_q[0], atol=1e-7)
    np.testing.assert_allclose(p_opt.cam_t[0], p_bad.cam_t[0], atol=1e-7)
    np.testing.assert_allclose(p_opt.cam_t[1], p_bad.cam_t[1], atol=1e-7)


def test_ba_fixed_points_triangulation_mode():
    # all cameras fixed, optimize points only (run_triangulation's GBA mode)
    p0, _ = build_problem(noise_px=0.0, seed=7)
    rng = np.random.default_rng(8)
    pts_bad = p0.points + jnp.asarray(
        rng.normal(scale=0.1, size=p0.points.shape).astype(np.float32)
    )
    p_bad = dataclasses.replace(
        p0,
        points=pts_bad,
        fix_cam=jnp.ones(p0.cam_q.shape[0], bool),
    )
    p_opt, _ = solve_ba(p_bad, BAOptions(max_iters=15))
    np.testing.assert_allclose(p_opt.cam_q, p0.cam_q, atol=1e-7)
    np.testing.assert_allclose(p_opt.points, p0.points, atol=1e-2)


def test_ba_robust_to_outliers():
    p0, _ = build_problem(noise_px=0.3, seed=9)
    # corrupt 10% of observations
    rng = np.random.default_rng(10)
    uv = np.array(p0.obs_uv)
    n = len(uv)
    bad = rng.uniform(size=n) < 0.1
    uv[bad] += rng.uniform(30, 120, size=(bad.sum(), 2))
    p0 = dataclasses.replace(p0, obs_uv=jnp.asarray(uv))
    p_bad = perturb(p0, seed=11)
    p_opt, _ = solve_ba(p_bad, BAOptions(max_iters=25, huber_px=2.0))
    r, _ = _residuals_only(p_opt)
    rn = np.sqrt(np.sum(np.asarray(r) ** 2, -1))
    # inlier residuals should sit at the noise floor despite the outliers
    med = np.median(rn[~bad])
    assert med < 0.8, med


def test_analytic_jacobians_match_autodiff():
    from xrsfm_tpu.optim.ba import (
        _residuals_and_jacobians,
        _residuals_and_jacobians_ad,
    )

    p0, _ = build_problem(n_cams=3, n_pts=40, noise_px=0.5, seed=21)
    # use a distorting camera to exercise the distortion Jacobian
    from xrsfm_tpu.utils import camera as C
    import jax.numpy as jnp

    intri = np.tile(
        C.canonicalize_params(C.OPENCV, [500.0, 505.0, 320, 240, 0.05, -0.01, 0.001, -0.002]),
        (3, 1),
    ).astype(np.float32)
    p0 = dataclasses.replace(p0, cam_intri=jnp.asarray(intri))
    r1, z1, Jc1, Jp1 = _residuals_and_jacobians(p0)
    r2, z2, Jc2, Jp2 = _residuals_and_jacobians_ad(p0)
    np.testing.assert_allclose(r1, r2, atol=1e-3)
    np.testing.assert_allclose(z1, z2, atol=1e-5)
    np.testing.assert_allclose(Jc1, Jc2, atol=2e-2, rtol=1e-3)
    np.testing.assert_allclose(Jp1, Jp2, atol=2e-2, rtol=1e-3)


def test_ell_path_matches_segment_path():
    """The gather-major (ELL) kernels must agree with the segment_sum
    kernels: identical normal-equation blocks, and full solves reaching the
    same cost (steps differ only by the bf16 CG matvecs)."""
    from xrsfm_tpu.optim import ba as B

    p0, _ = build_problem(n_cams=6, n_pts=120, noise_px=0.3, seed=0, drop=0.1)
    pb = perturb(p0, seed=31)
    n_valid = int(np.sum(np.asarray(pb.obs_w) > 0))
    ell = B.build_ell(
        pb.obs_cam, pb.obs_pt, pb.cam_q.shape[0], pb.points.shape[0]
    )
    r, z, Jc, Jp = B._residuals_and_jacobians(pb)
    _, w = B._robust_cost_and_weight(r, z, pb.obs_w, 4.0)
    U1, V1, W1, bc1, bp1 = B._build_normal_blocks(pb, r, Jc, Jp, w)
    U2, V2, bc2, bp2 = B._build_normal_blocks_ell(pb, ell, r, Jc, Jp, w)
    # the ELL path gathers Jacobians in bf16 (f32 accumulation): blocks
    # agree to bf16 relative precision (~1%), which the 1e-2-tolerance
    # inexact-Newton CG absorbs
    for a, b in [(U1, U2), (V1, V2), (bc1, bc2), (bp1, bp2)]:
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1.5e-2 * scale)

    s1, i1 = solve_ba(pb, BAOptions(max_iters=20, huber_px=4.0))
    s2, i2 = solve_ba(pb, BAOptions(max_iters=20, huber_px=4.0), ell)
    c1, c2 = float(i1["final_cost"]), float(i2["final_cost"])
    assert abs(c1 - c2) < 0.05 * max(c1, 1.0), (c1, c2)
    assert rms_px(s2) < rms_px(pb) * 0.2


def test_camera_major_packing_matches_unpacked():
    """pack_camera_major (contiguous camera rows, physical padding) must
    produce the same normal-equation blocks and the same solve as the
    gather-based ELL layout."""
    from xrsfm_tpu.optim import ba as B

    p0, _ = build_problem(n_cams=6, n_pts=120, noise_px=0.3, seed=4, drop=0.1)
    pb = perturb(p0, seed=11)
    ell0 = B.build_ell(
        pb.obs_cam, pb.obs_pt, pb.cam_q.shape[0], pb.points.shape[0]
    )
    pk, ellk = B.pack_camera_major(pb)
    assert ellk.cam.contig
    # padded slots carry zero weight
    w = np.asarray(pk.obs_w)
    assert np.isclose(np.sum(w), np.sum(np.asarray(pb.obs_w)))

    r0, z0, Jc0, Jp0 = B._residuals_and_jacobians(pb)
    _, w0 = B._robust_cost_and_weight(r0, z0, pb.obs_w, 4.0)
    U0, V0, bc0, bp0 = B._build_normal_blocks_ell(pb, ell0, r0, Jc0, Jp0, w0)
    rk, zk, Jck, Jpk = B._residuals_and_jacobians(pk)
    _, wk = B._robust_cost_and_weight(rk, zk, pk.obs_w, 4.0)
    Uk, Vk, bck, bpk = B._build_normal_blocks_ell(pk, ellk, rk, Jck, Jpk, wk)
    for a, b in [(U0, Uk), (V0, Vk), (bc0, bck), (bp0, bpk)]:
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1.5e-2 * scale)

    s1, i1 = solve_ba(pb, BAOptions(max_iters=20, huber_px=4.0), ell0)
    s2, i2 = solve_ba(pk, BAOptions(max_iters=20, huber_px=4.0), ellk)
    c1, c2 = float(i1["final_cost"]), float(i2["final_cost"])
    assert abs(c1 - c2) < 0.05 * max(c1, 1.0), (c1, c2)
    np.testing.assert_allclose(
        np.asarray(s1.cam_t), np.asarray(s2.cam_t), atol=2e-2
    )


def test_build_ell_tables_are_consistent():
    from xrsfm_tpu.optim import ba as B

    rng = np.random.default_rng(3)
    n_cams, n_pts, n_obs = 7, 40, 300
    oc = rng.integers(0, n_cams, n_obs).astype(np.int32)
    op = rng.integers(0, n_pts, n_obs).astype(np.int32)
    ell = B.build_ell(oc, op, n_cams, n_pts)
    cs = np.asarray(ell.cam.slots)
    ps = np.asarray(ell.pt.slots)
    # every observation appears exactly once in each table
    got_c = np.sort(cs[cs < n_obs])
    got_p = np.sort(ps[ps < n_obs])
    np.testing.assert_array_equal(got_c, np.arange(n_obs))
    np.testing.assert_array_equal(got_p, np.arange(n_obs))
    # rows point at the right segments
    cam_seg = np.asarray(ell.cam.seg)
    for r in range(cs.shape[0]):
        idx = cs[r][cs[r] < n_obs]
        assert np.all(oc[idx] == cam_seg[r])
    # companion id tables match the flat arrays
    co = np.asarray(ell.pt.other)
    valid = ps < n_obs
    assert np.all(co[valid] == oc[ps[valid]])
    po = np.asarray(ell.cam.other)
    validc = cs < n_obs
    assert np.all(po[validc] == op[cs[validc]])


# ---------------------------------------------------------------------------
# intrinsics refinement (reference: GBA frees camera_param,
# ba_solver.cc:330-356; LBA pins it :389)
# ---------------------------------------------------------------------------


def _intri_problem(k1_gt=-0.08, n_cams=8, n_pts=200, noise_px=0.0, seed=40,
                   shared=True):
    """Scene observed through a SIMPLE_RADIAL camera (f, cx, cy, k1)."""
    import jax
    from xrsfm_tpu.optim import ba as B

    s = make_scene(n_cams=n_cams, n_pts=n_pts, seed=seed)
    rng = np.random.default_rng(seed + 1)
    f, cx, cy = 500.0, 320.0, 240.0
    gt = C.canonicalize_params(C.SIMPLE_RADIAL, [f, cx, cy, k1_gt])
    intri = np.tile(gt, (n_cams, 1)).astype(np.float32)
    uv_px = np.array(
        C.normalized_to_image(jnp.asarray(intri)[:, None, :],
                              jnp.asarray(s["uv"]))
    )
    uv_px += rng.normal(scale=noise_px, size=uv_px.shape)
    cam_idx = np.repeat(np.arange(n_cams), n_pts).astype(np.int32)
    pt_idx = np.tile(np.arange(n_pts), n_cams).astype(np.int32)
    fix_cam = np.zeros(n_cams, bool); fix_cam[0] = True
    fix_trans = np.zeros(n_cams, bool); fix_trans[1] = True
    free, tie = C.intri_free_mask(C.SIMPLE_RADIAL)
    kam = (np.zeros(n_cams, np.int32) if shared
           else np.arange(n_cams, dtype=np.int32))
    prob = BAProblem(
        cam_q=jnp.asarray(s["q"]), cam_t=jnp.asarray(s["t"]),
        cam_intri=jnp.asarray(intri), points=jnp.asarray(s["xyz"]),
        obs_uv=jnp.asarray(uv_px.reshape(-1, 2).astype(np.float32)),
        obs_cam=jnp.asarray(cam_idx), obs_pt=jnp.asarray(pt_idx),
        obs_w=jnp.ones(len(cam_idx), jnp.float32),
        fix_cam=jnp.asarray(fix_cam), fix_trans=jnp.asarray(fix_trans),
        fix_pt=jnp.zeros(n_pts, bool),
        cam_kam=jnp.asarray(kam),
        fix_intri=jnp.asarray(np.tile(~free, (n_cams, 1))),
        tie_f=jnp.asarray(np.full(n_cams, tie)),
    )
    return prob, gt


def _perturb_intri(p, df_rel=0.05, dk1=0.05, dc_px=3.0, seed=41):
    intri = np.array(p.cam_intri)
    intri[:, 0] *= (1.0 + df_rel)
    intri[:, 1] *= (1.0 + df_rel)
    intri[:, 2] += dc_px
    intri[:, 3] -= dc_px
    intri[:, 4] += dk1
    return dataclasses.replace(p, cam_intri=jnp.asarray(intri))


def test_intri_jacobian_matches_autodiff():
    """Analytic d pix / d (pose6, intri8) columns vs jacfwd through the
    same retraction used by _apply_step."""
    import jax
    from xrsfm_tpu.optim import ba as B
    from xrsfm_tpu.utils import camera as Cam

    p, _ = _intri_problem(n_cams=3, n_pts=20, seed=50)
    # untied OPENCV camera exercises every column
    intri = np.tile(
        C.canonicalize_params(
            C.OPENCV, [480.0, 505.0, 320, 240, 0.06, -0.02, 0.002, -0.001]
        ),
        (3, 1),
    ).astype(np.float32)
    free, tie = C.intri_free_mask(C.OPENCV)
    p = dataclasses.replace(
        p, cam_intri=jnp.asarray(intri),
        fix_intri=jnp.asarray(np.tile(~free, (3, 1))),
        tie_f=jnp.zeros(3, bool),
    )
    r0, z0, Jfull, Jp = B._residuals_and_jacobians(p, with_intri=True)

    def res_of(d14, q, t, intri_, uv, xyz):
        q2, t2 = G.pose_retract(q, t, d14[:6])
        fx = intri_[0] * jnp.exp(d14[6])
        fy = intri_[1] * jnp.exp(d14[7])
        i2 = jnp.concatenate([jnp.stack([fx, fy]), intri_[2:] + d14[8:]])
        xy, _ = Cam.project(i2, q2, t2, xyz)
        return xy - uv

    q = p.cam_q[p.obs_cam]; t = p.cam_t[p.obs_cam]
    ii = p.cam_intri[p.obs_cam]; xyz = p.points[p.obs_pt]
    J_ad = jax.vmap(
        lambda q_, t_, i_, uv_, x_: jax.jacfwd(
            lambda d: res_of(d, q_, t_, i_, uv_, x_)
        )(jnp.zeros(14))
    )(q, t, ii, p.obs_uv, xyz)
    np.testing.assert_allclose(
        np.asarray(Jfull), np.asarray(J_ad), atol=2e-2, rtol=2e-3
    )


def test_gba_recovers_perturbed_intrinsics():
    """VERDICT r1 done-criterion: 5%-perturbed focal + k1 recovered to
    <0.1% by an intrinsics-refining GBA (noiseless observations)."""
    from xrsfm_tpu.optim import ba as B

    p0, gt = _intri_problem(noise_px=0.0, shared=True)
    pb = _perturb_intri(p0)
    pk, ell = B.pack_camera_major(pb)
    sol, info = solve_ba(
        pk, BAOptions(max_iters=40, huber_px=4.0, precise=True,
                      optimize_intrinsics=True), ell
    )
    got = np.asarray(sol.cam_intri)[0]
    assert abs(got[0] - gt[0]) / gt[0] < 1e-3, (got[0], gt[0])
    assert abs(got[4] - gt[4]) < 1e-3, (got[4], gt[4])
    assert abs(got[2] - gt[2]) < 0.5 and abs(got[3] - gt[3]) < 0.5, got[2:4]
    # tied focal stays tied, shared block stays shared
    np.testing.assert_allclose(got[0], got[1], rtol=1e-6)
    nz = np.asarray(sol.cam_intri)[: p0.cam_q.shape[0]]
    np.testing.assert_allclose(nz, np.tile(nz[0], (len(nz), 1)), rtol=1e-5)


def test_gba_intrinsics_per_image_blocks():
    """1DSfM-style: every frame its own intrinsic block; each recovers its
    own perturbed focal under noise."""
    from xrsfm_tpu.optim import ba as B

    p0, gt = _intri_problem(noise_px=0.3, shared=False, seed=60)
    rng = np.random.default_rng(61)
    intri = np.array(p0.cam_intri)
    per = 1.0 + rng.uniform(-0.05, 0.05, len(intri))
    intri[:, 0] *= per
    intri[:, 1] *= per
    intri[:, 4] += rng.uniform(-0.04, 0.04, len(intri))
    pb = dataclasses.replace(p0, cam_intri=jnp.asarray(intri))
    pk, ell = B.pack_camera_major(pb)
    sol, _ = solve_ba(
        pk, BAOptions(max_iters=40, huber_px=4.0, precise=True,
                      optimize_intrinsics=True), ell
    )
    got = np.asarray(sol.cam_intri)
    rel = np.abs(got[:, 0] - gt[0]) / gt[0]
    assert np.median(rel) < 5e-3, rel
    assert np.median(np.abs(got[:, 4] - gt[4])) < 5e-3


def test_pose_only_solves_ignore_intrinsics_fields():
    """optimize_intrinsics=False leaves cam_intri untouched even when the
    metadata fields are present."""
    from xrsfm_tpu.optim import ba as B

    p0, _ = _intri_problem(noise_px=0.2, seed=70)
    pb = perturb(p0, seed=71)
    pk, ell = B.pack_camera_major(pb)
    sol, _ = solve_ba(pk, BAOptions(max_iters=10, huber_px=4.0), ell)
    np.testing.assert_array_equal(
        np.asarray(sol.cam_intri), np.asarray(pk.cam_intri)
    )
