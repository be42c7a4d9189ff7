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


@functools.partial(
    jax.jit,
    static_argnames=("iters", "prior_weight", "scale_weight", "rot_weight"),
)
def solve_pose_graph(
    p: PoseGraphProblem,
    iters: int = 30,
    prior_weight: float = 0.02,
    scale_weight: float = 0.1,
    rot_weight: float = 2.0,
):
    """LM over (w, t, log_s), w a right-multiplied so(3) update of q.
    Returns (q [N,4], t [N,3], s [N], final_cost, initial_cost)."""
    N = p.t.shape[0]
    D = 7

    def unpack(x):
        # rotations retract from the INITIAL q each iteration via the
        # accumulated rotation vector (global chart around q0; drift
        # corrections are far below pi so the chart never degenerates)
        q = G.quat_mul(p.q, G.so3_exp_quat(x[:, :3]))
        return q, x[:, 3:6], x[:, 6]

    def residual_vec(x):
        q, t, log_s = unpack(x)
        r = _edge_residuals(p, q, t, log_s, scale_weight, rot_weight)
        r_prior = prior_weight * log_s * (~p.fixed)
        return jnp.concatenate([r.reshape(-1), r_prior])

    def cost_of(x):
        r = residual_vec(x)
        return jnp.sum(r * r)

    x0 = jnp.concatenate(
        [jnp.zeros((N, 3), p.t.dtype), p.t, p.log_s[:, None]], axis=-1
    )
    free = (~p.fixed)[:, None].astype(x0.dtype)

    def lm_body(carry, _):
        x, lam, cost = carry
        J = jax.jacfwd(lambda xf: residual_vec(xf.reshape(N, D)))(x.reshape(-1))
        r = residual_vec(x)
        JTJ = J.T @ J
        g = J.T @ r
        mask = jnp.repeat(free[:, 0], D)
        JTJ = JTJ * mask[:, None] * mask[None, :]
        g = g * mask
        A = JTJ + lam * jnp.diag(jnp.diag(JTJ)) + 1e-8 * jnp.eye(D * N)
        dx = -jnp.linalg.solve(A, g)
        x2 = x + dx.reshape(N, D) * free
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
    """
    out_q, out_t = [], []
    for i, j in pairs:
        qr, tr = G.pose_relative_np(q[i], t[i], q[j], t[j])
        out_q.append(qr)
        out_t.append(tr)
    e_i = np.asarray([a for a, _ in pairs], np.int32)
    e_j = np.asarray([b for _, b in pairs], np.int32)
    w = np.ones(len(pairs), np.float32) if weights is None else np.asarray(weights, np.float32)
    return (
        e_i, e_j,
        np.asarray(out_q, np.float32),
        np.asarray(out_t, np.float32),
        np.zeros(len(pairs), np.float32),
        w,
    )
