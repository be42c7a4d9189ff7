"""Distributed Schur-complement bundle adjustment over a device mesh.

The reference has no distributed computation at all (SURVEY.md §2.9: single
process, OpenMP pair loop, 8 Ceres threads).  This module *introduces* the
TPU-native scale-out called for by BASELINE.json's north star:

  * the COO observation table is sharded over the mesh's "obs" axis —
    residual/Jacobian evaluation is embarrassingly parallel;
  * per-camera 6x6 blocks (U), per-point 3x3 blocks (V), and gradient
    blocks are partial-summed locally and reduced with lax.psum over ICI;
  * the reduced camera system (after in-kernel point marginalization) is
    solved with PCG whose matvec is itself a psum of local per-shard
    contributions — cameras stay replicated (they are tiny: 6C floats);
  * the LM outer loop stays in jit via lax.while_loop.

This mirrors the single-chip solver in optim/ba.py step for step, so the
two paths are testable against each other on a CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..optim import ba as ba_mod
from ..optim.ba import BAProblem


def shard_problem(p: BAProblem, n_shards: int) -> BAProblem:
    """Pad the observation table to a multiple of n_shards (weight-0 pad)."""
    O = p.obs_uv.shape[0]
    pad = (-O) % n_shards
    if pad == 0:
        return p
    def padded(a, fill=0):
        return jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0
        )
    return dataclasses.replace(
        p,
        obs_uv=padded(p.obs_uv),
        obs_cam=padded(p.obs_cam),
        obs_pt=padded(p.obs_pt),
        obs_w=padded(p.obs_w),
    )


def make_distributed_lm_step(mesh: Mesh, axis: str = "obs"):
    """Build a jitted distributed LM step.

    Returns step(problem, lam) -> (new_problem, new_lam, cost, accepted).
    The observation arrays must be sharded (or shardable) over `axis`;
    cameras and points are replicated.
    """
    n_dev = mesh.shape[axis]

    obs_spec = P(axis)
    rep = P()

    def _local_blocks(prob_rep, obs_uv, obs_cam, obs_pt, obs_w, huber_px):
        """Per-shard residuals/Jacobians and partial normal-eq blocks."""
        local = dataclasses.replace(
            prob_rep, obs_uv=obs_uv, obs_cam=obs_cam, obs_pt=obs_pt, obs_w=obs_w
        )
        r, z, Jc, Jp = ba_mod._residuals_and_jacobians(local)
        cost_l, w = ba_mod._robust_cost_and_weight(r, z, obs_w, huber_px)
        U, V, W, bc, bp = ba_mod._build_normal_blocks(local, r, Jc, Jp, w)
        return cost_l, U, V, W, bc, bp

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(rep, obs_spec, obs_spec, obs_spec, obs_spec, rep, rep),
        out_specs=(rep, rep, rep, rep),
        check_vma=False,
    )
    def _sharded_step(prob_rep, obs_uv, obs_cam, obs_pt, obs_w, lam, huber_px):
        C = prob_rep.cam_q.shape[0]
        Pn = prob_rep.points.shape[0]
        cost_l, U_l, V_l, W_loc, bc_l, bp_l = _local_blocks(
            prob_rep, obs_uv, obs_cam, obs_pt, obs_w, huber_px
        )
        cost = jax.lax.psum(cost_l, axis)
        U = jax.lax.psum(U_l, axis)
        V = jax.lax.psum(V_l, axis)
        bc = jax.lax.psum(bc_l, axis)
        bp = jax.lax.psum(bp_l, axis)

        eye6 = jnp.eye(6, dtype=U.dtype)
        eye3 = jnp.eye(3, dtype=U.dtype)
        Ud = U + lam * (U * eye6) + 1e-8 * eye6
        Vd = V + lam * (V * eye3) + 1e-8 * eye3
        Vinv = ba_mod._inv3x3(Vd)

        def S_matvec(x):
            # local contribution through this shard's observations
            WTx = jnp.einsum("oji,oj->oi", W_loc, x[obs_cam])
            yp = jax.ops.segment_sum(WTx, obs_pt, num_segments=Pn)
            yp = jax.lax.psum(yp, axis)
            zp = jnp.einsum("pij,pj->pi", Vinv, yp)
            Wz = jnp.einsum("oij,oj->oi", W_loc, zp[obs_pt])
            t2 = jax.ops.segment_sum(Wz, obs_cam, num_segments=C)
            t2 = jax.lax.psum(t2, axis)
            return jnp.einsum("cij,cj->ci", Ud, x) - t2

        Wvb_l = jnp.einsum(
            "oij,oj->oi", W_loc, jnp.einsum("pij,pj->pi", Vinv, bp)[obs_pt]
        )
        rhs = bc - jax.lax.psum(
            jax.ops.segment_sum(Wvb_l, obs_cam, num_segments=C), axis
        )

        WVW_l = jnp.einsum("oij,ojk,olk->oil", W_loc, Vinv[obs_pt], W_loc)
        Sdiag = Ud - jax.lax.psum(
            jax.ops.segment_sum(WVW_l, obs_cam, num_segments=C), axis
        ) + 1e-7 * eye6
        Minv = jnp.linalg.solve(Sdiag, jnp.broadcast_to(eye6, (C, 6, 6)))

        def precond(x):
            return jnp.einsum("cij,cj->ci", Minv, x)

        x0 = jnp.zeros_like(rhs)
        r0 = rhs
        z0 = precond(r0)
        rz0 = jnp.sum(r0 * z0)
        bnorm = jnp.sqrt(jnp.sum(rhs * rhs)) + 1e-30

        def cg_cond(c):
            i, x, r_, z_, pk, rz = c
            return (i < 50) & (jnp.sqrt(jnp.sum(r_ * r_)) > 1e-6 * bnorm)

        def cg_body(c):
            i, x, r_, z_, pk, rz = c
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
            cg_cond, cg_body, (0, x0, r0, z0, z0, rz0)
        )

        WTdx_l = jax.ops.segment_sum(
            jnp.einsum("oji,oj->oi", W_loc, dx_c[obs_cam]), obs_pt,
            num_segments=Pn,
        )
        WTdx = jax.lax.psum(WTdx_l, axis)
        dx_p = jnp.einsum("pij,pj->pi", Vinv, bp - WTdx)
        return cost, dx_c, dx_p, bc

    @jax.jit
    def step(prob: BAProblem, lam, huber_px=jnp.float32(4.0)):
        prob_rep = dataclasses.replace(
            prob,
            obs_uv=jnp.zeros((0, 2), prob.obs_uv.dtype),
            obs_cam=jnp.zeros(0, prob.obs_cam.dtype),
            obs_pt=jnp.zeros(0, prob.obs_pt.dtype),
            obs_w=jnp.zeros(0, prob.obs_w.dtype),
        )
        cost, dx_c, dx_p, _ = _sharded_step(
            prob_rep, prob.obs_uv, prob.obs_cam, prob.obs_pt, prob.obs_w,
            lam, huber_px,
        )
        cand = ba_mod._apply_step(prob, dx_c, dx_p)
        # evaluate candidate cost (replicated evaluation is fine: obs math
        # re-shards automatically under jit)
        r, z = ba_mod._residuals_only(cand)
        new_cost, _ = ba_mod._robust_cost_and_weight(r, z, prob.obs_w, huber_px)
        accept = new_cost < cost
        out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, b, a), prob, cand
        )
        lam2 = jnp.where(accept, lam * 0.5, lam * 4.0)
        lam2 = jnp.clip(lam2, 1e-10, 1e8)
        return out, lam2, jnp.where(accept, new_cost, cost), accept

    return step


def solve_distributed(
    mesh: Mesh,
    prob: BAProblem,
    max_iters: int = 20,
    lam0: float = 1e-4,
    huber_px: float = 4.0,
):
    """Host-looped distributed LM solve (each iteration is one jitted
    distributed step)."""
    n_dev = mesh.shape["obs"]
    prob = shard_problem(prob, n_dev)
    sharding = NamedSharding(mesh, P("obs"))
    rep = NamedSharding(mesh, P())
    prob = dataclasses.replace(
        prob,
        obs_uv=jax.device_put(prob.obs_uv, sharding),
        obs_cam=jax.device_put(prob.obs_cam, sharding),
        obs_pt=jax.device_put(prob.obs_pt, sharding),
        obs_w=jax.device_put(prob.obs_w, sharding),
        cam_q=jax.device_put(prob.cam_q, rep),
        cam_t=jax.device_put(prob.cam_t, rep),
        cam_intri=jax.device_put(prob.cam_intri, rep),
        points=jax.device_put(prob.points, rep),
        fix_cam=jax.device_put(prob.fix_cam, rep),
        fix_trans=jax.device_put(prob.fix_trans, rep),
        fix_pt=jax.device_put(prob.fix_pt, rep),
    )
    step = make_distributed_lm_step(mesh)
    lam = jnp.asarray(lam0, jnp.float32)
    cost = None
    for _ in range(max_iters):
        prob, lam, cost, accepted = step(prob, lam, jnp.float32(huber_px))
    return prob, float(cost)
