"""Jitted device kernels for the incremental mapping loop.

Each kernel takes fixed-shape padded arrays (host pads to power-of-two
buckets so XLA compiles once per bucket) and is cached by jax.jit.  These
replace the reference's per-point scalar loops:
  * pnp_ransac   — LORANSAC<P3P, refine> registration
    (reference: SolvePnP_colmap, src/geometry/pnp.cc:253-272)
  * robust_triangulate — RANSAC-over-observation-pairs multi-view
    triangulation (reference: EstimateTriangulation,
    src/geometry/colmap/estimators/triangulation.cc:167-197) — all C(V,2)
    two-view hypotheses are evaluated at once instead of sampling
  * two_view_check / essential_ransac — init-pair verification
    (reference: solve_essential + CheckInitFramePair,
    src/geometry/essential.cc:389-404, map_initializer.cc:13-139)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import epipolar, pnp, ransac, triangulation as tri
from ..utils import geometry as G


def bucket(n: int, lo: int = 64) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def pad_rows(a: np.ndarray, n: int, fill=0.0) -> np.ndarray:
    if len(a) >= n:
        return a[:n]
    pad = np.full((n - len(a),) + a.shape[1:], fill, a.dtype)
    return np.concatenate([a, pad], axis=0)


# ---------------------------------------------------------------------------
# registration
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def pnp_ransac(key, uv, xyz, mask, threshold, num_hypotheses: int = 256):
    """P3P RANSAC + LM refine.  uv [N,2] normalized, xyz [N,3], mask [N].

    Returns (q [4], t [3], inliers [N], num_inliers, success).
    """
    return _pnp_ransac_impl(key, uv, xyz, mask, threshold, num_hypotheses)


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def pnp_ransac_batch(keys, uv, xyz, mask, thresholds,
                     num_hypotheses: int = 256):
    """Registration of MANY frames in one dispatch (SURVEY §7.3: batch
    independent registrations — the reference registers one frame at a
    time, MaxPoint3dFrameId returns the single best).

    keys [B,2] uint32, uv [B,N,2], xyz [B,N,3], mask [B,N],
    thresholds [B].  Returns batched (q [B,4], t [B,3], inliers [B,N],
    num_inliers [B], success [B])."""
    return jax.vmap(
        lambda k, u, x, m, th: _pnp_ransac_impl(
            k, u, x, m, th, num_hypotheses
        )
    )(keys, uv, xyz, mask, thresholds)


def _pnp_ransac_impl(key, uv, xyz, mask, threshold, num_hypotheses: int):
    def estimate(sampled, sample_valid):
        uv_s, xyz_s = sampled
        q, t, valid = pnp.p3p(xyz_s, uv_s)
        return (q, t), valid & jnp.all(sample_valid)

    def residual(models, data):
        q, t = models
        uv_d, xyz_d = data
        return pnp.pnp_residuals(q, t, uv_d, xyz_d)

    res = ransac.ransac(
        key,
        data=(uv, xyz),
        mask=mask,
        estimate_fn=estimate,
        residual_fn=residual,
        sample_size=3,
        threshold=threshold,
        num_hypotheses=num_hypotheses,
        refit_fn=None,
    )
    q, t = res.model
    # LO stage (reference: LORANSAC<P3P, EPNP> + Ceres refine,
    # pnp.cc:39-71, absolute_pose.cc:188-621): refit GLOBAL closed-form
    # solvers on the inlier set, LM-polish every candidate, keep the best
    # support.  EPnP escapes the P3P minimal-sample basin; IPPE
    # enumerates BOTH planar-ambiguity poses, which removes the
    # wall-dominated mirror-pose failure (error_correct.py docstring)
    # without 2-view special-casing.
    from ..ops import epnp as EPNP

    w = res.inliers.astype(uv.dtype)
    q_e, t_e = EPNP.epnp(xyz, uv, w)
    q_p, t_p = EPNP.ippe(xyz, uv, w)  # [2,4], [2,3]
    cand_q = jnp.stack([q, q_e, q_p[0], q_p[1]])
    cand_t = jnp.stack([t, t_e, t_p[0], t_p[1]])
    q_r, t_r = jax.vmap(
        lambda qq, tt: pnp.refine_pose(qq, tt, uv, xyz, w, iters=10)
    )(cand_q, cand_t)
    r_all = pnp.pnp_residuals(q_r, t_r, uv, xyz)  # [4,N]
    inl_all = (r_all <= threshold) & mask[None, :]
    support = jnp.sum(inl_all, axis=1)
    best = jnp.argmax(support)
    better = support[best] >= res.num_inliers
    q3 = jnp.where(better, q_r[best], q)
    t3 = jnp.where(better, t_r[best], t)
    inl3 = jnp.where(better, inl_all[best], res.inliers)
    return q3, t3, inl3, jnp.sum(inl3), res.success


# ---------------------------------------------------------------------------
# triangulation
# ---------------------------------------------------------------------------


def _pair_indices(V: int):
    ii, jj = np.triu_indices(V, k=1)
    return jnp.asarray(ii), jnp.asarray(jj)


@functools.partial(jax.jit, static_argnames=())
def _robust_triangulate_impl(q, t, uv, mask, th, min_angle):
    """q [B,V,4], t [B,V,3], uv [B,V,2] normalized, mask [B,V].

    Returns xyz [B,3], obs_ok [B,V], ok [B], angle [B].
    """
    B, V = mask.shape
    ii, jj = _pair_indices(V)  # [H]

    def solve_one(qb, tb, uvb, mb):
        # all two-view hypotheses
        X = tri.triangulate_two_view(
            qb[ii], tb[ii], uvb[ii], qb[jj], tb[jj], uvb[jj]
        )  # [H,3]
        hyp_valid = mb[ii] & mb[jj]
        # score every hypothesis against every observation
        err = tri.reprojection_errors(
            qb[None, :, :], tb[None, :, :], uvb[None, :, :], X[:, None, :]
        )  # [H,V]
        good = (err <= th) & mb[None, :]
        # hypothesis must have enough ray angle
        c1 = G.pose_center(qb[ii], tb[ii])
        c2 = G.pose_center(qb[jj], tb[jj])
        ang_h = tri.triangulation_angle(c1, c2, X)
        hyp_valid &= ang_h >= min_angle
        score = jnp.sum(good, axis=1)
        score = jnp.where(hyp_valid, score, -1)
        best = jnp.argmax(score)
        # refit: masked multiview DLT on the best hypothesis' inliers
        obs_ok = good[best]
        Xr = tri.triangulate_multiview(qb, tb, uvb, obs_ok.astype(uvb.dtype))
        err_r = tri.reprojection_errors(qb, tb, uvb, Xr[None, :])
        obs_ok_r = (err_r <= th) & mb
        use_refit = jnp.sum(obs_ok_r) >= jnp.sum(obs_ok)
        Xf = jnp.where(use_refit, Xr, X[best])
        obs_f = jnp.where(use_refit, obs_ok_r, obs_ok)
        # max pairwise angle among accepted observations
        centers = G.pose_center(qb, tb)
        pair_ok = obs_f[ii] & obs_f[jj]
        ang_pairs = tri.triangulation_angle(centers[ii], centers[jj], Xf[None, :])
        max_ang = jnp.max(jnp.where(pair_ok, ang_pairs, 0.0))
        ok = (jnp.sum(obs_f) >= 2) & (score[best] >= 2) & (max_ang >= min_angle)
        return Xf, obs_f & ok, ok, max_ang

    return jax.vmap(solve_one)(q, t, uv, mask)


def robust_triangulate(q, t, uv, mask, th, min_angle):
    return _robust_triangulate_impl(
        q, t, uv, mask, jnp.asarray(th, jnp.float32), jnp.asarray(min_angle, jnp.float32)
    )


@jax.jit
def reproj_errors_batch(q, t, uv, xyz):
    """q [N,4], t [N,3], uv [N,2] normalized, xyz [N,3] -> err [N], z [N]."""
    err = tri.reprojection_errors(q, t, uv, xyz)
    z = tri.depths(q, t, xyz)
    return err, z


@functools.partial(jax.jit, static_argnames=("iters",))
def refine_poses_batch(q, t, uv, xyz, w, huber_delta, iters: int = 10):
    """Motion-only pose refinement for MANY frames in one dispatch:
    vmapped LM on Huber-weighted normalized reprojection with the 3D
    points held fixed (ops/pnp.refine_pose per row).

    q [B,4], t [B,3], uv [B,N,2] normalized, xyz [B,N,3], w [B,N],
    huber_delta [B] (normalized units; 0 masks a slot out via w).  Used
    to re-fit non-keyframe poses against the structure after KGBA /
    pose-graph corrections moved the keyframes (the reference's
    UpdateByRefFrame propagation alone leaves them at stale relative
    offsets)."""
    return jax.vmap(
        lambda qi, ti, uvi, xi, wi, hi: pnp.refine_pose(
            qi, ti, uvi, xi, wi, iters=iters, huber_delta=hi
        )
    )(q, t, uv, xyz, w, huber_delta)


# ---------------------------------------------------------------------------
# two-view initialization
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("num_hypotheses", "use_5pt")
)
def essential_ransac(
    key, uv1, uv2, mask, threshold, num_hypotheses: int = 512,
    use_5pt: bool = True,
):
    """Essential RANSAC: Nister 5-point minimal hypotheses (up to 10
    models per sample, reference: solve_essential, essential.cc:389-404)
    with an 8-point + manifold-projection LO refit on the winner's
    inliers.  Returns (E, inliers, num_inliers, success)."""
    from ..ops.essential5pt import essential_5pt

    if use_5pt:
        def estimate(sampled, sample_valid):
            x1, x2 = sampled
            Es, valid = essential_5pt(x1, x2, sample_valid)
            return Es, valid & jnp.all(sample_valid)

        sample_size = 5
        hypotheses = max(num_hypotheses // 8, 64)  # 10 models per sample
    else:
        def estimate(sampled, sample_valid):
            x1, x2 = sampled
            E, valid = epipolar.essential_8pt(x1, x2, sample_valid)
            return E[None], (valid & jnp.all(sample_valid))[None]

        sample_size = 8
        hypotheses = num_hypotheses

    def residual(E, data):
        x1, x2 = data
        return epipolar.sampson_error(E, x1, x2)

    def refit(data, inl):
        x1, x2 = data
        return epipolar.essential_8pt(x1, x2, inl)

    res = ransac.ransac(
        key,
        data=(uv1, uv2),
        mask=mask,
        estimate_fn=estimate,
        residual_fn=residual,
        sample_size=sample_size,
        threshold=threshold,
        num_hypotheses=hypotheses,
        refit_fn=refit,
        lo_iters=2,
    )
    return res.model, res.inliers, res.num_inliers, res.success


def _init_probe_one(key, uv1, uv2, mask, threshold):
    """essential_ransac + init_pair_stats fused: one traced program, so a
    batch of candidate pairs probes in ONE dispatch (find_and_initialize
    previously paid 2 dispatches + 2 eager transfers + 1 fetch per
    candidate per gate-relaxation attempt)."""
    E, inl, n_inl, success = essential_ransac(key, uv1, uv2, mask, threshold)
    q, t, n_good, X, good, ang = init_pair_stats(E, uv1, uv2, inl)
    return q, t, n_good, X, good, ang, n_inl, success


@jax.jit
def init_probe_batch(keys, uv1, uv2, mask, threshold):
    """Vmapped candidate probe.  keys [K,2] uint32, uv1/uv2 [K,B,2],
    mask [K,B], threshold [K].  Returns per-candidate
    (q [K,4], t [K,3], n_good [K], X [K,B,3], good [K,B], ang [K,B],
    n_inl [K], success [K])."""
    return jax.vmap(_init_probe_one)(keys, uv1, uv2, mask, threshold)


@jax.jit
def init_pair_stats(E, uv1, uv2, inliers):
    """Decompose E, count triangulable points and their angles.

    Returns (q, t, n_cheirality, xyz [N,3], good [N], angles [N]).
    (reference: CheckInitFramePair, map_initializer.cc:13-139)."""
    q, t, n_good, good = epipolar.recover_pose_from_essential(E, uv1, uv2, inliers)
    n = uv1.shape[0]
    qi = jnp.array([1.0, 0, 0, 0], uv1.dtype)
    ti = jnp.zeros(3, uv1.dtype)
    X = tri.triangulate_two_view(
        jnp.broadcast_to(qi, (n, 4)),
        jnp.broadcast_to(ti, (n, 3)),
        uv1,
        jnp.broadcast_to(q, (n, 4)),
        jnp.broadcast_to(t, (n, 3)),
        uv2,
    )
    c1 = jnp.zeros(3, uv1.dtype)
    c2 = G.pose_center(q, t)
    ang = tri.triangulation_angle(c1, c2, X)
    return q, t, n_good, X, good, ang
