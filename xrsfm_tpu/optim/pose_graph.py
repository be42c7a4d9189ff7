"""Scale-drift-aware pose graph optimization (loop closing).

(reference: BASolver::ScalePoseGraphUnorder,
src/optimization/ba_solver.cc:147-328 + PoseGraphCost/ScaleCost,
src/optimization/cost_factor_ceres.h:117-221)

The reference corrects monocular scale drift at loop closures by
optimizing, per keyframe, the translation and a positive scale s_i
(rotations held constant, :248-249), with:
  * covisibility edges measuring the current relative transform;
  * loop edges from the two conflicting pose hypotheses of the corrected
    frame;
  * a scale-ratio residual s_i/s_j vs. the measured ratio and a weak
    scale regularizer.

TPU-native design: variables are flat arrays (t [N,3], log_s [N]); every
edge residual and its analytic Jacobian is evaluated with one vmap over
the edge table; the damped normal equations (6N small) are solved with
dense Cholesky on device inside a jitted LM loop.  Convention: poses are
Tcw; the relative measurement for edge (i, j) is
T_ij = T_i * T_j^{-1} = (R_ij, t_ij).

Residual (7-dim, rotations constant):
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
    q: jax.Array  # [N, 4] fixed rotations (Tcw)
    t: jax.Array  # [N, 3] translations (optimized)
    log_s: jax.Array  # [N] log scales (optimized)
    e_i: jax.Array  # [E] int32 edge source
    e_j: jax.Array  # [E] int32 edge target
    e_rot: jax.Array  # [E, 4] measured q_ij (T_i * T_j^-1)
    e_trans: jax.Array  # [E, 3] measured t_ij
    e_logs: jax.Array  # [E] measured log scale ratio log(s_i/s_j)
    e_w: jax.Array  # [E] edge weights (0 = padding)
    fixed: jax.Array  # [N] bool — anchor frames (t and s frozen)


def _edge_residuals(p: PoseGraphProblem, t, log_s, scale_weight=0.1):
    """[E, 4] residuals: 3 translation + 1 (weak) scale smoothness.

    The scale-consistency term is a soft regularizer — the reference
    weights it separately (weight_o, cost_factor_ceres.h:117-198) so that
    per-frame scales can absorb drift while staying locally smooth."""
    Rij = G.quat_to_rotmat(p.e_rot)  # [E,3,3]
    ti = t[p.e_i]
    tj = t[p.e_j]
    si = jnp.exp(log_s[p.e_i])
    pred_t = ti - jnp.einsum("eij,ej->ei", Rij, tj)
    r_t = pred_t - si[:, None] * p.e_trans
    r_s = scale_weight * (log_s[p.e_i] - log_s[p.e_j] - p.e_logs)
    return jnp.concatenate([r_t, r_s[:, None]], axis=-1) * p.e_w[:, None]


@functools.partial(
    jax.jit, static_argnames=("iters", "prior_weight", "scale_weight")
)
def solve_pose_graph(
    p: PoseGraphProblem,
    iters: int = 30,
    prior_weight: float = 0.02,
    scale_weight: float = 0.1,
):
    """LM over (t, log_s).  Returns (t [N,3], s [N], final_cost)."""
    N = p.t.shape[0]

    def residual_vec(x):
        t = x[:, :3]
        log_s = x[:, 3]
        r = _edge_residuals(p, t, log_s, scale_weight).reshape(-1)
        r_prior = prior_weight * log_s * (~p.fixed)
        return jnp.concatenate([r, r_prior])

    def cost_of(x):
        r = residual_vec(x)
        return jnp.sum(r * r)

    x0 = jnp.concatenate([p.t, p.log_s[:, None]], axis=-1)  # [N,4]
    free = (~p.fixed)[:, None].astype(x0.dtype)

    def lm_body(carry, _):
        x, lam, cost = carry
        J = jax.jacfwd(lambda xf: residual_vec(xf.reshape(N, 4)))(x.reshape(-1))
        r = residual_vec(x)
        JTJ = J.T @ J
        g = J.T @ r
        mask = jnp.repeat(free[:, 0], 4)
        JTJ = JTJ * mask[:, None] * mask[None, :]
        g = g * mask
        A = JTJ + lam * jnp.diag(jnp.diag(JTJ)) + 1e-8 * jnp.eye(4 * N)
        dx = -jnp.linalg.solve(A, g)
        x2 = x + dx.reshape(N, 4) * free
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
    return x[:, :3], jnp.exp(x[:, 3]), cost


def build_edges_from_poses(q, t, pairs, weights=None):
    """Measured relative transforms T_ij = T_i T_j^{-1} for index pairs.

    q [N,4], t [N,3] numpy; pairs [(i, j), ...].  Returns edge arrays.
    """
    out_q, out_t = [], []
    for i, j in pairs:
        qi, ti = jnp.asarray(q[i]), jnp.asarray(t[i])
        qj, tj = jnp.asarray(q[j]), jnp.asarray(t[j])
        qr, tr = G.pose_relative(qi, ti, qj, tj)
        out_q.append(np.asarray(qr))
        out_t.append(np.asarray(tr))
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
