"""Distributed Schur-complement bundle adjustment over a device mesh.

The reference has no distributed computation at all (SURVEY.md §2.9: single
process, OpenMP pair loop, 8 Ceres threads).  This module *introduces* the
TPU-native scale-out called for by BASELINE.json's north star:

  * the COO observation table is sharded over the mesh's "obs" axis —
    residual/Jacobian evaluation is embarrassingly parallel;
  * each shard owns its slice of the observation table PLUS its own ELL
    row tables (optim/ba.build_ell over the local slice), so the sharded
    solver runs the exact same scatter-free gather-major kernels as the
    single-chip path, with a lax.psum at each per-segment reduction
    (the reduce_fn hook in _build_normal_blocks_ell / _schur_solve_ell);
  * cameras/points stay replicated (tiny: 6C + 3P floats); the reduced
    camera system is solved by replicated PCG whose matvec psums local
    per-shard contributions over ICI.

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
from ..optim.ba import BAProblem, EllIndex, RowIndex, build_ell


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


def build_sharded_ell(p: BAProblem, n_shards: int,
                      n_valid: int | None = None) -> EllIndex:
    """Per-shard ELL tables, padded to common shapes and stacked on a
    leading device axis ([n_dev, R, M] leaves, to be sharded over "obs").

    The observation table must already be padded to a multiple of
    n_shards (shard_problem); slot padding uses the LOCAL dummy index
    (= per-shard slice length)."""
    oc = np.asarray(p.obs_cam)
    op = np.asarray(p.obs_pt)
    O = len(oc)
    per = O // n_shards
    C = p.cam_q.shape[0]
    Pn = p.points.shape[0]
    nv = O if n_valid is None else int(n_valid)
    ells = []
    for i in range(n_shards):
        lo = i * per
        local_valid = int(np.clip(nv - lo, 0, per))
        ells.append(
            build_ell(oc[lo:lo + per], op[lo:lo + per], C, Pn,
                      n_valid=local_valid)
        )

    def stack_side(sides):
        Rm = max(s.slots.shape[0] for s in sides)
        Mm = max(s.slots.shape[1] for s in sides)
        slots = np.full((n_shards, Rm, Mm), per, np.int32)
        seg = np.zeros((n_shards, Rm), np.int32)
        other = np.zeros((n_shards, Rm, Mm), np.int32)
        for i, s in enumerate(sides):
            r, m = s.slots.shape
            slots[i, :r, :m] = np.asarray(s.slots)
            seg[i, :r] = np.asarray(s.seg)
            other[i, :r, :m] = np.asarray(s.other)
        # numpy leaves: placement happens in solve_distributed via
        # _put_global (multi-process-safe)
        return RowIndex(slots=slots, seg=seg, other=other)

    return EllIndex(
        cam=stack_side([e.cam for e in ells]),
        pt=stack_side([e.pt for e in ells]),
    )


def make_distributed_lm_step(mesh: Mesh, axis="obs",
                             cg_iters: int = 50, cg_tol: float = 1e-6,
                             optimize_intrinsics: bool = False):
    """Build a jitted distributed LM step.

    Returns step(problem, ell_stacked, lam, huber_px) ->
    (new_problem, new_lam, cost, accepted).  The observation arrays and
    the stacked ELL tables must be sharded over `axis`; cameras and
    points are replicated.

    optimize_intrinsics extends the camera tangent to 14 dof (pose +
    tied-intrinsics, reference: GBA frees camera_param per physical
    camera, ba_solver.cc:330-356) — the problem must carry
    cam_kam/fix_intri/tie_f (replicated; build_problem sets them).  The
    kam-block reductions inside the Schur solve act on the already
    psum-reduced [C,...] blocks, so the sharded path needs no extra
    collectives.

    `axis` may be a single mesh axis name or a tuple of names — passing
    ("dcn", "ici") from make_pod_mesh shards the observation table over
    the full pod and reduces the camera/point blocks with one psum over
    both axes; XLA lowers that to an in-host ICI reduce followed by the
    (much smaller) cross-host DCN stage (SURVEY.md §5.8)."""
    axes = (axis,) if isinstance(axis, str) else tuple(axis)
    obs_spec = P(axes)
    rep = P()
    ell_spec = EllIndex(
        cam=RowIndex(slots=obs_spec, seg=obs_spec, other=obs_spec),
        pt=RowIndex(slots=obs_spec, seg=obs_spec, other=obs_spec),
    )

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(rep, obs_spec, obs_spec, obs_spec, obs_spec, ell_spec,
                  rep, rep),
        out_specs=(rep, rep, rep),
        check_vma=False,
    )
    def _sharded_step(prob_rep, obs_uv, obs_cam, obs_pt, obs_w, ell_st,
                      lam, huber_px):
        # drop the leading (sharded) device axis of the ELL tables
        ell = jax.tree_util.tree_map(lambda a: a[0], ell_st)
        local = dataclasses.replace(
            prob_rep, obs_uv=obs_uv, obs_cam=obs_cam, obs_pt=obs_pt,
            obs_w=obs_w,
        )
        red = lambda x: jax.lax.psum(x, axes)  # noqa: E731
        r, z, Jc, Jp = ba_mod._residuals_and_jacobians(
            local, with_intri=optimize_intrinsics
        )
        cost_l, w = ba_mod._robust_cost_and_weight(r, z, obs_w, huber_px)
        cost = jax.lax.psum(cost_l, axes)
        U, V, bc, bp = ba_mod._build_normal_blocks_ell(
            local, ell, r, Jc, Jp, w, reduce_fn=red
        )
        dx_c, dx_p = ba_mod._schur_solve_ell(
            local, ell, U, V, bc, bp, Jc, Jp, w, lam, cg_iters, cg_tol,
            reduce_fn=red,
        )
        return cost, dx_c, dx_p

    @jax.jit
    def step(prob: BAProblem, ell_st: EllIndex, lam,
             huber_px=jnp.float32(4.0)):
        prob_rep = dataclasses.replace(
            prob,
            obs_uv=jnp.zeros((0, 2), prob.obs_uv.dtype),
            obs_cam=jnp.zeros(0, prob.obs_cam.dtype),
            obs_pt=jnp.zeros(0, prob.obs_pt.dtype),
            obs_w=jnp.zeros(0, prob.obs_w.dtype),
        )
        cost, dx_c, dx_p = _sharded_step(
            prob_rep, prob.obs_uv, prob.obs_cam, prob.obs_pt, prob.obs_w,
            ell_st, lam, huber_px,
        )
        cand = ba_mod._apply_step(prob, dx_c, dx_p)
        # candidate cost (obs math re-shards automatically under jit)
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


def _put_global(a, sharding):
    """Place a host array under `sharding`, multi-process-safe.

    jax.device_put cannot target non-addressable devices; on a
    multi-process (pod) mesh each process materializes only its
    addressable shards from the (replicated-on-every-host) numpy array.
    Single-process behavior is identical to device_put."""
    a = np.asarray(a)
    return jax.make_array_from_callback(
        a.shape, sharding, lambda idx: a[idx]
    )


def solve_distributed(
    mesh: Mesh,
    prob: BAProblem,
    max_iters: int = 20,
    lam0: float = 1e-4,
    huber_px: float = 4.0,
    axis="obs",
    stats: dict | None = None,
    optimize_intrinsics: bool = False,
):
    """Host-looped distributed LM solve (each iteration is one jitted
    distributed step).  `axis` may name one mesh axis or a tuple such as
    ("dcn", "ici") for a pod mesh (parallel/mesh.make_pod_mesh).

    When `stats` is a dict it receives initial_cost/final_cost/iters
    (the production run_ba path reports them like the single-chip
    solver's info)."""
    axes = (axis,) if isinstance(axis, str) else tuple(axis)
    n_dev = int(np.prod([mesh.shape[a] for a in axes]))
    w_np = np.asarray(prob.obs_w)
    nz = np.nonzero(w_np > 0)[0]
    n_valid = int(nz[-1]) + 1 if len(nz) else 0  # trailing rows are padding
    prob = shard_problem(prob, n_dev)
    ell_st = build_sharded_ell(prob, n_dev, n_valid=n_valid)
    sharding = NamedSharding(mesh, P(axes))
    rep = NamedSharding(mesh, P())
    prob = dataclasses.replace(
        prob,
        obs_uv=_put_global(prob.obs_uv, sharding),
        obs_cam=_put_global(prob.obs_cam, sharding),
        obs_pt=_put_global(prob.obs_pt, sharding),
        obs_w=_put_global(prob.obs_w, sharding),
        cam_q=_put_global(prob.cam_q, rep),
        cam_t=_put_global(prob.cam_t, rep),
        cam_intri=_put_global(prob.cam_intri, rep),
        points=_put_global(prob.points, rep),
        fix_cam=_put_global(prob.fix_cam, rep),
        fix_trans=_put_global(prob.fix_trans, rep),
        fix_pt=_put_global(prob.fix_pt, rep),
        cam_kam=(
            _put_global(prob.cam_kam, rep)
            if prob.cam_kam is not None else None
        ),
        fix_intri=(
            _put_global(prob.fix_intri, rep)
            if prob.fix_intri is not None else None
        ),
        tie_f=(
            _put_global(prob.tie_f, rep)
            if prob.tie_f is not None else None
        ),
    )
    ell_st = jax.tree_util.tree_map(
        lambda a: _put_global(a, sharding), ell_st
    )
    if optimize_intrinsics and (
        prob.cam_kam is None or prob.fix_intri is None
    ):
        raise ValueError(
            "optimize_intrinsics requires cam_kam/fix_intri on the problem"
        )
    step = make_distributed_lm_step(
        mesh, axis=axes, optimize_intrinsics=optimize_intrinsics
    )
    lam = jnp.asarray(lam0, jnp.float32)
    cost = None
    for it in range(max_iters):
        prob, lam, cost, accepted = step(prob, ell_st, lam, jnp.float32(huber_px))
        if it == 0 and stats is not None:
            stats["initial_cost"] = float(cost)
    if stats is not None:
        stats["final_cost"] = float(cost)
        stats["iters"] = max_iters
    return prob, float(cost)
