"""Scale-drift-aware pose graph optimization (loop closing).

(reference: BASolver::ScalePoseGraphUnorder,
src/optimization/ba_solver.cc:147-328 + PoseGraphCost/ScaleCost,
src/optimization/cost_factor_ceres.h:117-221)

The reference corrects monocular scale drift at loop closures by
optimizing, per keyframe, the translation and a positive scale s_i with
rotations held constant (:248-249).  That suits its phone/KITTI capture
regime where drift is dominated by scale.  Loops traversed in one long
arm also accumulate ROTATIONAL drift, which a translation-only graph
cannot remove — so this solver optimizes the full pose: a rotation
update w_i in so(3) (right-multiplied, as the reference's QuatParam),
translation t_i, and log-scale log s_i, 7 DoF per keyframe, with:
  * covisibility edges measuring the current relative transform;
  * loop edges from the two conflicting pose hypotheses of the corrected
    frame;
  * a scale-ratio residual log s_i - log s_j vs. the measured ratio and
    a weak scale regularizer.

TPU-native design: variables are one flat [N, 7] array; every edge
residual is evaluated with one vmap over the edge table and
differentiated with jacfwd; the damped normal equations (7N small for
keyframe graphs) are solved with dense Cholesky on device inside a
jitted LM lax.scan.  Convention: poses are Tcw; the relative measurement
for edge (i, j) is T_ij = T_i * T_j^{-1} = (R_ij, t_ij).

Residual (7-dim):
  r_rot = w_r * log( q_hat_ij^-1 * (q_i * q_j^-1) )   (rotation mismatch)
  r_t = (t_i - R_ij t_j) - s_i * t_hat_ij         (translation, drift-scaled)
  r_s = log(s_i) - log(s_j) - log(s_hat_ij)       (scale consistency)
  plus per-frame weak prior  w_prior * log(s_i).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import geometry as G


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PoseGraphProblem:
    q: jax.Array  # [N, 4] initial rotations (Tcw), optimized
    t: jax.Array  # [N, 3] translations (optimized)
    log_s: jax.Array  # [N] log scales (optimized)
    e_i: jax.Array  # [E] int32 edge source
    e_j: jax.Array  # [E] int32 edge target
    e_rot: jax.Array  # [E, 4] measured q_ij (T_i * T_j^-1)
    e_trans: jax.Array  # [E, 3] measured t_ij
    e_logs: jax.Array  # [E] measured log scale ratio log(s_i/s_j)
    e_w: jax.Array  # [E] edge weights (0 = padding)
    fixed: jax.Array  # [N] bool — anchor frames (pose and s frozen)


def _quat_conj(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], q.dtype)


def _edge_residuals(p: PoseGraphProblem, q, t, log_s,
                    scale_weight=0.1, rot_weight=2.0):
    """[E, 7] residuals: 3 rotation + 3 translation + 1 (weak) scale
    smoothness.

    The scale-consistency term is a soft regularizer — the reference
    weights it separately (weight_o, cost_factor_ceres.h:117-198) so that
    per-frame scales can absorb drift while staying locally smooth."""
    qij = G.quat_mul(q[p.e_i], _quat_conj(q[p.e_j]))  # current T_i T_j^-1
    r_rot = rot_weight * G.so3_log(G.quat_mul(_quat_conj(p.e_rot), qij))
    Rij = G.quat_to_rotmat(qij)  # [E,3,3]
    ti = t[p.e_i]
    tj = t[p.e_j]
    si = jnp.exp(log_s[p.e_i])
    pred_t = ti - jnp.einsum("eij,ej->ei", Rij, tj)
    r_t = pred_t - si[:, None] * p.e_trans
    r_s = scale_weight * (log_s[p.e_i] - log_s[p.e_j] - p.e_logs)
    return (
        jnp.concatenate([r_rot, r_t, r_s[:, None]], axis=-1)
        * p.e_w[:, None]
    )


def _edge_residual_one(xi, xj, q0i, q0j, e_rot, e_trans, e_logs, w,
                       scale_weight, rot_weight):
    """[7] residual of one edge as a function of the two node states
    xi, xj = (w_so3 [3], t [3], log_s [1]) — the per-edge unit that the
    sparse solver differentiates (vmapped jacfwd)."""
    qi = G.quat_mul(q0i, G.so3_exp_quat(xi[:3]))
    qj = G.quat_mul(q0j, G.so3_exp_quat(xj[:3]))
    qij = G.quat_mul(qi, _quat_conj(qj))
    r_rot = rot_weight * G.so3_log(G.quat_mul(_quat_conj(e_rot), qij))
    Rij = G.quat_to_rotmat(qij)
    pred_t = xi[3:6] - Rij @ xj[3:6]
    r_t = pred_t - jnp.exp(xi[6]) * e_trans
    r_s = scale_weight * (xi[6] - xj[6] - e_logs)
    return jnp.concatenate([r_rot, r_t, r_s[None]]) * w


def _tridiag_precond(Hd, Hsup, beta: float = 0.1):
    """Factor the block-tridiagonal part of H (block-Thomas, one scan)
    and return a solver x ↦ T⁻¹ x.

    beta adds diagonal dominance (T = Hd·(1+beta on diag) + offdiag)
    before factoring: the chain of Schur complements d'_i loses positive
    definiteness in f32 as elimination walks away from the anchored
    frame (measured: divergence from node ~16 of a 24-chain, NaN steps
    in CG); the boosted factor stays PD at the cost of a few extra CG
    iterations.  Preconditioner-only — the CG matvec uses the exact H.

    Hd [N,7,7] diagonal blocks (damped), Hsup [N,7,7] super-diagonal
    blocks (Hsup[i] couples node i to i+1; row N-1 is zero).  Pose graphs
    are chains plus a few loop/covisibility edges, so T captures almost
    all of H: PCG with T⁻¹ converges in a handful of iterations
    independent of N — the property that lets a 5,000-frame KITTI-class
    graph solve in seconds where a dense solve would be a 35k x 35k
    factorization (reference capability: ScalePoseGraphUnorder,
    ba_solver.cc:147-328, backed by Ceres' sparse solvers)."""
    from .ba import _inv_spd

    N = Hd.shape[0]
    Hd = Hd + beta * (Hd * jnp.eye(Hd.shape[-1], dtype=Hd.dtype))

    def fwd(carry, inp):
        dprev_inv = carry  # inv(d'_{i-1}) [7,7]
        hd, hsub = inp  # hsub = Hsup[i-1]^T couples i to i-1
        d = hd - hsub @ dprev_inv @ jnp.swapaxes(hsub, -1, -2)
        dinv = _inv_spd(d)
        return dinv, dinv

    hsub = jnp.concatenate(
        [jnp.zeros((1, 7, 7), Hd.dtype), jnp.swapaxes(Hsup[:-1], -1, -2)]
    )
    d0inv = _inv_spd(Hd[0])
    # scan over rows 1..N-1 chaining the Schur updates
    _, dinvs_rest = jax.lax.scan(fwd, d0inv, (Hd[1:], hsub[1:]))
    dinvs = jnp.concatenate([d0inv[None], dinvs_rest])  # [N,7,7]

    def solve(b):  # b [N,7]
        # forward substitution: y_i = dinv_i (b_i - Hsub_i y_{i-1})
        def f(yprev, inp):
            dinv, hsub_i, bi = inp
            y = dinv @ (bi - hsub_i @ yprev)
            return y, y

        _, y = jax.lax.scan(f, jnp.zeros(7, b.dtype), (dinvs, hsub, b))

        # backward: x_i = y_i - dinv_i Hsup_i x_{i+1}
        def g2(xnext, inp):
            dinv, hsup_i, yi = inp
            x = yi - dinv @ (hsup_i @ xnext)
            return x, x

        _, xr = jax.lax.scan(
            g2, jnp.zeros(7, b.dtype), (dinvs, Hsup, y), reverse=True
        )
        return xr

    return solve


@functools.partial(
    jax.jit,
    static_argnames=("iters", "prior_weight", "scale_weight", "rot_weight",
                     "cg_iters", "cg_tol"),
)
def solve_pose_graph(
    p: PoseGraphProblem,
    iters: int = 30,
    prior_weight: float = 0.02,
    scale_weight: float = 0.1,
    rot_weight: float = 2.0,
    cg_iters: int = 50,
    cg_tol: float = 1e-3,
):
    """Sparse LM over (w, t, log_s), w a right-multiplied so(3) update.

    Edge-structured Gauss-Newton: per-edge 7x7 Jacobian blocks (vmapped
    jacfwd of _edge_residual_one), normal equations kept as {diagonal
    blocks [N,7,7], per-edge coupling blocks [E,7,7]}, solved matrix-free
    with PCG under the block-tridiagonal (chain) preconditioner — never
    materializing the 7Nx7N system the previous dense implementation
    built (review finding r1-weak#6).  Returns
    (q [N,4], t [N,3], s [N], final_cost, initial_cost)."""
    N = p.t.shape[0]
    D = 7

    def unpack(x):
        # rotations retract from the INITIAL q each iteration via the
        # accumulated rotation vector (global chart around q0; drift
        # corrections are far below pi so the chart never degenerates)
        q = G.quat_mul(p.q, G.so3_exp_quat(x[:, :3]))
        return q, x[:, 3:6], x[:, 6]

    def cost_of(x):
        q, t, log_s = unpack(x)
        r = _edge_residuals(p, q, t, log_s, scale_weight, rot_weight)
        r_prior = prior_weight * log_s * (~p.fixed)
        return jnp.sum(r * r) + jnp.sum(r_prior * r_prior)

    x0 = jnp.concatenate(
        [jnp.zeros((N, 3), p.t.dtype), p.t, p.log_s[:, None]], axis=-1
    )
    free = (~p.fixed)[:, None].astype(x0.dtype)

    res_and_jac = jax.vmap(
        lambda xi, xj, q0i, q0j, er, et, el, w: (
            _edge_residual_one(xi, xj, q0i, q0j, er, et, el, w,
                               scale_weight, rot_weight),
            jax.jacfwd(
                lambda a, b: _edge_residual_one(
                    a, b, q0i, q0j, er, et, el, w, scale_weight, rot_weight
                ),
                argnums=(0, 1),
            )(xi, xj),
        )
    )

    # adjacency of consecutive nodes for the tridiagonal preconditioner:
    # edge (i, j) with |i-j| == 1 lands in the super-diagonal block
    lo = jnp.minimum(p.e_i, p.e_j)
    adj = ((jnp.abs(p.e_i - p.e_j) == 1) & (p.e_w > 0))

    def lm_body(carry, _):
        x, lam, cost = carry
        r, (Ji, Jj) = res_and_jac(
            x[p.e_i], x[p.e_j], p.q[p.e_i], p.q[p.e_j],
            p.e_rot, p.e_trans, p.e_logs, p.e_w,
        )  # r [E,7], Ji/Jj [E,7,7]
        # gauge: zero columns of fixed nodes
        Ji = Ji * free[p.e_i][:, None, :]
        Jj = Jj * free[p.e_j][:, None, :]
        # diagonal blocks + gradient
        Hd = jax.ops.segment_sum(
            jnp.einsum("eri,erj->eij", Ji, Ji), p.e_i, num_segments=N
        ) + jax.ops.segment_sum(
            jnp.einsum("eri,erj->eij", Jj, Jj), p.e_j, num_segments=N
        )
        g = jax.ops.segment_sum(
            jnp.einsum("eri,er->ei", Ji, r), p.e_i, num_segments=N
        ) + jax.ops.segment_sum(
            jnp.einsum("eri,er->ei", Jj, r), p.e_j, num_segments=N
        )
        # scale prior: r = pw * log_s  (state entry 6)
        pw2 = prior_weight * prior_weight
        Hd = Hd.at[:, 6, 6].add(pw2 * free[:, 0])
        g = g.at[:, 6].add(pw2 * x[:, 6] * free[:, 0])
        # per-edge coupling blocks W_e = Ji^T Jj (node e_i <-> e_j)
        W = jnp.einsum("eri,erj->eij", Ji, Jj)  # [E,7,7]

        lamHd = Hd + lam * (Hd * jnp.eye(D, dtype=Hd.dtype)) + 1e-8 * jnp.eye(
            D, dtype=Hd.dtype
        )

        # symmetric Jacobi scaling H̃ = S H S, S = diag(1/√diag H): with
        # translations hundreds of units large, rotation columns dwarf
        # translation columns (|∂r_t/∂w| ~ |t|) and κ(H) exceeds f32 —
        # measured: CG drove the residual down 8x while the actual error
        # moved <1% on a 1,000-frame KITTI-class chain.  Scaled, the
        # diagonal is 1 and the chain preconditioner works at any N.
        dH = jnp.diagonal(lamHd, axis1=-2, axis2=-1)  # [N,7]
        s = jnp.where(dH > 1e-7, jax.lax.rsqrt(jnp.maximum(dH, 1e-7)), 0.0)
        lamHd_s = lamHd * s[:, :, None] * s[:, None, :]
        W_s = W * s[p.e_i][:, :, None] * s[p.e_j][:, None, :]

        def H_matvec(v):  # [N,7] scaled space
            out = jnp.einsum("nij,nj->ni", lamHd_s, v)
            out = out + jax.ops.segment_sum(
                jnp.einsum("eij,ej->ei", W_s, v[p.e_j]), p.e_i, num_segments=N
            )
            out = out + jax.ops.segment_sum(
                jnp.einsum("eji,ej->ei", W_s, v[p.e_i]), p.e_j, num_segments=N
            )
            return out

        # tridiagonal preconditioner from the adjacent-edge couplings:
        # W of edge (i,i+1) goes to Hsup[i]; edge (i+1,i) transposed
        Wsup = jnp.where(
            (p.e_i < p.e_j)[:, None, None], W_s, jnp.swapaxes(W_s, -1, -2)
        )
        Hsup = jax.ops.segment_sum(
            jnp.where(adj[:, None, None], Wsup, 0.0), lo, num_segments=N
        )
        prec = _tridiag_precond(lamHd_s, Hsup)

        b = -g * s
        xk = jnp.zeros_like(b)
        rk = b
        zk = prec(rk)
        rz = jnp.sum(rk * zk)
        bnorm = jnp.sqrt(jnp.sum(b * b)) + 1e-30

        def cg_cond(c):
            i, xk, rk, zk, pk, rz = c
            return (i < cg_iters) & (
                jnp.sqrt(jnp.sum(rk * rk)) > cg_tol * bnorm
            )

        def cg_body(c):
            i, xk, rk, zk, pk, rz = c
            Ap = H_matvec(pk)
            den = jnp.sum(pk * Ap)
            alpha = rz / jnp.where(jnp.abs(den) < 1e-30, 1e-30, den)
            xk2 = xk + alpha * pk
            rk2 = rk - alpha * Ap
            zk2 = prec(rk2)
            rz2 = jnp.sum(rk2 * zk2)
            beta = rz2 / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
            return i + 1, xk2, rk2, zk2, zk2 + beta * pk, rz2

        _, dx, _, _, _, _ = jax.lax.while_loop(
            cg_cond, cg_body, (0, xk, rk, zk, zk, rz)
        )
        dx = dx * s  # back to the unscaled tangent

        x2 = x + dx * free
        c2 = cost_of(x2)
        better = c2 < cost
        x = jnp.where(better, x2, x)
        cost2 = jnp.where(better, c2, cost)
        lam2 = jnp.clip(jnp.where(better, lam * 0.5, lam * 4.0), 1e-10, 1e8)
        return (x, lam2, cost2), None

    c0 = cost_of(x0)
    (x, lam, cost), _ = jax.lax.scan(
        lm_body, (x0, jnp.asarray(1e-4, x0.dtype), c0), None, length=iters
    )
    q, t, log_s = unpack(x)
    return q, t, jnp.exp(log_s), cost, c0


def build_edges_from_poses(q, t, pairs, weights=None):
    """Measured relative transforms T_ij = T_i T_j^{-1} for index pairs.

    q [N,4], t [N,3] numpy; pairs [(i, j), ...].  Returns edge arrays.
    Vectorized over all pairs (pose_relative_np batches)."""
    pairs = np.asarray(pairs, np.int64).reshape(-1, 2)
    e_i = pairs[:, 0].astype(np.int32)
    e_j = pairs[:, 1].astype(np.int32)
    q = np.asarray(q)
    t = np.asarray(t)
    out_q, out_t = G.pose_relative_np(q[e_i], t[e_i], q[e_j], t[e_j])
    w = (
        np.ones(len(pairs), np.float32)
        if weights is None
        else np.asarray(weights, np.float32)
    )
    return (
        e_i, e_j,
        np.asarray(out_q, np.float32),
        np.asarray(out_t, np.float32),
        np.zeros(len(pairs), np.float32),
        w,
    )
