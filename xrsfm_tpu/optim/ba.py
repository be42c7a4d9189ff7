"""From-scratch Levenberg-Marquardt bundle adjuster with Schur complement.

This replaces the reference's Ceres dependency (reference:
src/optimization/ba_solver.cc — GBA :594-638, KGBA :640-678, LBA :523-592,
all SPARSE_SCHUR + LM with 8 CPU threads).  TPU-native design:

  * The problem is a flat COO observation table (obs_cam, obs_pt, obs_uv)
    instead of Ceres parameter blocks; residuals and Jacobians evaluate as
    one batched vmap over observations (VPU/MXU-friendly, no pointer
    chasing).
  * Normal equations are never materialized globally.  Per-camera 6x6
    blocks U, per-point 3x3 blocks V, and per-observation 6x3 coupling
    blocks W are built with segment_sums; the point blocks are marginalized
    in closed form (batched 3x3 inverse), and the reduced camera system
    S dx = rhs is solved matrix-free with preconditioned conjugate
    gradients (block-Jacobi preconditioner = Ceres' SCHUR_JACOBI).
  * The LM trust-region loop (lambda up/down on accept/reject) runs inside
    jit via lax.while_loop with all-branch computation.
  * Huber robustness is IRLS re-weighting; the reference's negative-depth
    guard (constant residual (12,12), cost_factor_ceres.h:29-32) maps to
    zero IRLS weight + constant cost for cheirality-violating observations.
  * Gauge freedom is fixed by masking Jacobian columns: fully-frozen
    cameras, translation-only frozen cameras (the reference freezes the
    init-pair translations, ba_solver.cc:610-614), and frozen points
    (triangulation mode, :615-622).

The same solver core scales out: every segment_sum over observations can be
sharded over a device mesh with a psum reduction of the per-camera blocks
(see xrsfm_tpu/parallel/dist_ba.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..utils import camera as Cam
from ..utils import geometry as G

_BAD_RESIDUAL = 12.0  # matches reference's negative-depth guard constant


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BAProblem:
    """Flat COO bundle-adjustment problem (all arrays fixed-shape, padded)."""

    cam_q: jax.Array  # [C, 4] Tcw quaternions
    cam_t: jax.Array  # [C, 3]
    cam_intri: jax.Array  # [C, 8] canonical intrinsics
    points: jax.Array  # [P, 3]
    obs_uv: jax.Array  # [O, 2] pixel observations
    obs_cam: jax.Array  # [O] int32
    obs_pt: jax.Array  # [O] int32
    obs_w: jax.Array  # [O] float32, 0 = padded-out observation
    fix_cam: jax.Array  # [C] bool — freeze full pose
    fix_trans: jax.Array  # [C] bool — freeze translation only
    fix_pt: jax.Array  # [P] bool — freeze point


@dataclasses.dataclass(frozen=True)
class BAOptions:
    """Static solver options (hashable: used as a jit static argument)."""

    max_iters: int = 20
    cg_iters: int = 15  # truncated Newton: block-Jacobi PCG rarely needs more
    huber_px: float = 2.0
    lam_init: float = 1e-4
    lam_up: float = 4.0
    lam_down: float = 0.5
    lam_max: float = 1e8
    cg_tol: float = 1e-2  # inexact Newton: loose inner solves, LM absorbs it


def _obs_residual(delta9, q, t, intri, uv, xyz):
    """Residual of one observation under a 9-dof local perturbation
    (6 pose + 3 point).  Returns ([2] residual, depth)."""
    q2, t2 = G.pose_retract(q, t, delta9[:6])
    x2 = xyz + delta9[6:9]
    xy, z = Cam.project(intri, q2, t2, x2)
    return xy - uv, z


def _residuals_and_jacobians(p: BAProblem):
    """Batched residuals [O,2], depths [O], Jacobians Jc [O,2,6], Jp [O,2,3].

    Analytic chain (~4x cheaper than 9-tangent jacfwd):
      pc = R x + t;  proj = pc_xy / pc_z;  pix = f * distort(proj) + c
      d pix / d pc = diag(f) @ Jdist(proj) @ [[1/z, 0, -x/z^2],
                                              [0, 1/z, -y/z^2]]
      d pc / d dw = -R [x]_x   (right-multiplicative pose perturbation)
      d pc / d dt = I;  d pc / d x = R
    Verified against jax.jacfwd in tests/test_ba.py.
    """
    q = p.cam_q[p.obs_cam]
    t = p.cam_t[p.obs_cam]
    intri = p.cam_intri[p.obs_cam]
    xyz = p.points[p.obs_pt]

    R = G.quat_to_rotmat(q)  # [O,3,3]
    pc = jnp.einsum("oij,oj->oi", R, xyz) + t
    z = pc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    proj = pc[..., :2] / zs[..., None]
    pix = Cam.normalized_to_image(intri, proj)
    r = pix - p.obs_uv

    f2 = intri[..., :2]  # (fx, fy)
    Jd = Cam.distort_jacobian(intri, proj)  # [O,2,2]
    A = f2[..., :, None] * Jd  # diag(f) @ Jdist
    inv_z = 1.0 / zs
    Jproj = jnp.zeros(pc.shape[:-1] + (2, 3), pc.dtype)
    Jproj = Jproj.at[..., 0, 0].set(inv_z)
    Jproj = Jproj.at[..., 1, 1].set(inv_z)
    Jproj = Jproj.at[..., 0, 2].set(-pc[..., 0] * inv_z * inv_z)
    Jproj = Jproj.at[..., 1, 2].set(-pc[..., 1] * inv_z * inv_z)
    B = jnp.einsum("oij,ojk->oik", A, Jproj)  # [O,2,3] = d pix / d pc

    Jw = jnp.einsum("oij,ojk->oik", B, -jnp.einsum("oij,ojk->oik", R, G.skew(xyz)))
    Jt = B
    Jc = jnp.concatenate([Jw, Jt], axis=-1)  # [O,2,6]
    Jp = jnp.einsum("oij,ojk->oik", B, R)  # [O,2,3]
    return r, z, Jc, Jp


def _residuals_and_jacobians_ad(p: BAProblem):
    """jacfwd reference implementation (kept for testing the analytic
    Jacobians)."""
    q = p.cam_q[p.obs_cam]
    t = p.cam_t[p.obs_cam]
    intri = p.cam_intri[p.obs_cam]
    xyz = p.points[p.obs_pt]

    def rj(q_, t_, i_, uv_, x_):
        zero = jnp.zeros(9, p.cam_q.dtype)
        r0, z0 = _obs_residual(zero, q_, t_, i_, uv_, x_)
        J = jax.jacfwd(lambda d: _obs_residual(d, q_, t_, i_, uv_, x_)[0])(zero)
        return r0, z0, J

    r, z, J = jax.vmap(rj)(q, t, intri, p.obs_uv, xyz)
    return r, z, J[..., :6], J[..., 6:9]


def _residuals_only(p: BAProblem):
    q = p.cam_q[p.obs_cam]
    t = p.cam_t[p.obs_cam]
    intri = p.cam_intri[p.obs_cam]
    xyz = p.points[p.obs_pt]
    zero = jnp.zeros(9, p.cam_q.dtype)
    r, z = jax.vmap(lambda a, b, c, d, e: _obs_residual(zero, a, b, c, d, e))(
        q, t, intri, p.obs_uv, xyz
    )
    return r, z


def _robust_cost_and_weight(r, z, obs_w, huber_px):
    """Huber cost + IRLS weights; cheirality violations get the reference's
    constant residual and zero weight."""
    bad = z <= 1e-3
    rn2 = jnp.sum(r * r, axis=-1)
    rn2 = jnp.where(bad, 2.0 * _BAD_RESIDUAL**2, rn2)
    rn = jnp.sqrt(jnp.maximum(rn2, 1e-18))
    in_quad = rn <= huber_px
    cost = jnp.where(in_quad, rn2, huber_px * (2.0 * rn - huber_px))
    wirls = jnp.where(in_quad, 1.0, huber_px / rn)
    wirls = jnp.where(bad, 0.0, wirls)
    total = jnp.sum(obs_w * cost)
    return total, obs_w * wirls


def _inv3x3(M):
    """Batched closed-form 3x3 inverse with damping safeguard."""
    a = M[..., 0, 0]; b = M[..., 0, 1]; c = M[..., 0, 2]
    d = M[..., 1, 0]; e = M[..., 1, 1]; f = M[..., 1, 2]
    g = M[..., 2, 0]; h = M[..., 2, 1]; i = M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-12, jnp.sign(det) * 1e-12 + 1e-12, det)
    adj = jnp.stack(
        [
            A, -(b * i - c * h), (b * f - c * e),
            B, (a * i - c * g), -(a * f - c * d),
            C, -(a * h - b * g), (a * e - b * d),
        ],
        axis=-1,
    ).reshape(M.shape)
    return adj / det[..., None, None]


def _build_normal_blocks(p: BAProblem, r, Jc, Jp, w):
    """Segment-sum the damped normal-equation blocks."""
    C = p.cam_q.shape[0]
    P = p.points.shape[0]

    # gauge-fix masks applied to Jacobian columns
    cam_free = (~p.fix_cam)[p.obs_cam].astype(r.dtype)  # [O]
    trans_free = (~(p.fix_cam | p.fix_trans))[p.obs_cam].astype(r.dtype)
    colmask = jnp.concatenate(
        [
            jnp.repeat(cam_free[:, None], 3, axis=1),
            jnp.repeat(trans_free[:, None], 3, axis=1),
        ],
        axis=1,
    )  # [O, 6]
    Jc = Jc * colmask[:, None, :]
    pt_free = (~p.fix_pt)[p.obs_pt].astype(r.dtype)
    Jp = Jp * pt_free[:, None, None]

    wJc = Jc * w[:, None, None]
    wJp = Jp * w[:, None, None]

    U = jax.ops.segment_sum(
        jnp.einsum("ori,orj->oij", wJc, Jc), p.obs_cam, num_segments=C
    )  # [C,6,6]
    V = jax.ops.segment_sum(
        jnp.einsum("ori,orj->oij", wJp, Jp), p.obs_pt, num_segments=P
    )  # [P,3,3]
    W = jnp.einsum("ori,orj->oij", wJc, Jp)  # [O,6,3]
    bc = -jax.ops.segment_sum(
        jnp.einsum("ori,or->oi", wJc, r), p.obs_cam, num_segments=C
    )  # [C,6]
    bp = -jax.ops.segment_sum(
        jnp.einsum("ori,or->oi", wJp, r), p.obs_pt, num_segments=P
    )  # [P,3]
    return U, V, W, bc, bp


def _schur_solve(p: BAProblem, U, V, W, bc, bp, lam, cg_iters, cg_tol):
    """Marginalize points, PCG on the reduced camera system, back-substitute."""
    C = p.cam_q.shape[0]
    P = p.points.shape[0]
    eye6 = jnp.eye(6, dtype=U.dtype)
    eye3 = jnp.eye(3, dtype=U.dtype)

    # multiplicative LM damping on the block diagonals
    Ud = U + lam * (U * eye6) + 1e-8 * eye6
    Vd = V + lam * (V * eye3) + 1e-8 * eye3
    Vinv = _inv3x3(Vd)

    def S_matvec(x):  # x [C, 6]
        Ux = jnp.einsum("cij,cj->ci", Ud, x)
        WTx = jnp.einsum("oji,oj->oi", W, x[p.obs_cam])  # [O,3]
        yp = jax.ops.segment_sum(WTx, p.obs_pt, num_segments=P)
        zp = jnp.einsum("pij,pj->pi", Vinv, yp)
        Wz = jnp.einsum("oij,oj->oi", W, zp[p.obs_pt])  # [O,6]
        t2 = jax.ops.segment_sum(Wz, p.obs_cam, num_segments=C)
        return Ux - t2

    # rhs = bc - W Vinv bp
    Wvb = jnp.einsum("oij,oj->oi", W, jnp.einsum("pij,pj->pi", Vinv, bp)[p.obs_pt])
    rhs = bc - jax.ops.segment_sum(Wvb, p.obs_cam, num_segments=C)

    # block-Jacobi preconditioner: diag blocks of S
    WVW = jnp.einsum("oij,ojk,olk->oil", W, Vinv[p.obs_pt], W)  # [O,6,6]
    Sdiag = Ud - jax.ops.segment_sum(WVW, p.obs_cam, num_segments=C)
    Sdiag = Sdiag + 1e-7 * eye6
    # 6x6 inverses via batched solve
    Minv = jnp.linalg.solve(Sdiag, jnp.broadcast_to(eye6, (C, 6, 6)))

    def precond(x):
        return jnp.einsum("cij,cj->ci", Minv, x)

    # PCG
    x0 = jnp.zeros_like(rhs)
    r0 = rhs
    z0 = precond(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)
    bnorm = jnp.sqrt(jnp.sum(rhs * rhs)) + 1e-30

    def cg_cond(carry):
        i, x, r_, z_, pk, rz = carry
        return (i < cg_iters) & (jnp.sqrt(jnp.sum(r_ * r_)) > cg_tol * bnorm)

    def cg_body(carry):
        i, x, r_, z_, pk, rz = carry
        Ap = S_matvec(pk)
        denom = jnp.sum(pk * Ap)
        alpha = rz / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
        x = x + alpha * pk
        r_new = r_ - alpha * Ap
        z_new = precond(r_new)
        rz_new = jnp.sum(r_new * z_new)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
        return i + 1, x, r_new, z_new, z_new + beta * pk, rz_new

    _, dx_c, _, _, _, _ = jax.lax.while_loop(
        cg_cond, cg_body, (0, x0, r0, z0, p0, rz0)
    )

    # back-substitute points: dp = Vinv (bp - W^T dx_c)
    WTdx = jax.ops.segment_sum(
        jnp.einsum("oji,oj->oi", W, dx_c[p.obs_cam]), p.obs_pt, num_segments=P
    )
    dx_p = jnp.einsum("pij,pj->pi", Vinv, bp - WTdx)
    return dx_c, dx_p


def _apply_step(p: BAProblem, dx_c, dx_p) -> BAProblem:
    dx_c = dx_c * (~p.fix_cam)[:, None]
    dx_c = dx_c.at[:, 3:].multiply((~p.fix_trans)[:, None])
    q2, t2 = G.pose_retract(p.cam_q, p.cam_t, dx_c)
    pts2 = p.points + dx_p * (~p.fix_pt)[:, None]
    return dataclasses.replace(p, cam_q=q2, cam_t=t2, points=pts2)


@functools.partial(jax.jit, static_argnames=("opts",))
def solve_ba(p: BAProblem, opts: BAOptions = BAOptions()):
    """Run LM.  Returns (solved problem, info dict)."""

    def cost_of(prob):
        r, z = _residuals_only(prob)
        c, _ = _robust_cost_and_weight(r, z, prob.obs_w, opts.huber_px)
        return c

    def lm_cond(carry):
        it, prob, lam, cost, done = carry
        return (it < opts.max_iters) & (~done)

    def lm_body(carry):
        it, prob, lam, cost, done = carry
        r, z, Jc, Jp = _residuals_and_jacobians(prob)
        _, w = _robust_cost_and_weight(r, z, prob.obs_w, opts.huber_px)
        U, V, W, bc, bp = _build_normal_blocks(prob, r, Jc, Jp, w)
        dx_c, dx_p = _schur_solve(
            prob, U, V, W, bc, bp, lam, opts.cg_iters, opts.cg_tol
        )
        cand = _apply_step(prob, dx_c, dx_p)
        new_cost = cost_of(cand)
        accept = new_cost < cost
        prob = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, b, a), prob, cand
        )
        cost2 = jnp.where(accept, new_cost, cost)
        lam2 = jnp.where(accept, lam * opts.lam_down, lam * opts.lam_up)
        lam2 = jnp.clip(lam2, 1e-10, opts.lam_max)
        rel = jnp.abs(cost - cost2) / jnp.maximum(cost, 1e-12)
        done2 = accept & (rel < 1e-6)
        return it + 1, prob, lam2, cost2, done2

    c0 = cost_of(p)
    it, p_out, lam, c_final, _ = jax.lax.while_loop(
        lm_cond, lm_body, (0, p, jnp.asarray(opts.lam_init, p.cam_q.dtype), c0, jnp.asarray(False))
    )
    info = dict(initial_cost=c0, final_cost=c_final, iters=it, lam=lam)
    return p_out, info
