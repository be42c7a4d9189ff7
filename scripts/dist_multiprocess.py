"""Multi-process distributed BA dryrun (the DCN axis, for real).

Launches N coordinated processes (jax.distributed.initialize via
parallel/mesh.initialize_distributed, localhost coordinator), each with
4 virtual CPU devices, builds the (dcn=N, ici=4) pod mesh with
make_pod_mesh, and runs parallel/dist_ba.solve_distributed on the bench
BA problem sharded over BOTH axes.  Rank 0 prints the final cost; the
parent also runs the same solve single-process (dcn=1) and gates cost
parity at 1%.

This is the multi-process simulation SURVEY.md §4 prescribes for the
multi-host runtime: the reference is strictly single-process
(SURVEY.md §2.9), so there is no reference counterpart — the gate is
self-parity across process counts.  On a real TPU pod the same code
path initializes from the environment and the dcn axis rides DCN.

Usage:
  python scripts/dist_multiprocess.py [--procs 2] [--cams 50]
      [--pts 5000] [--iters 5]
Prints one JSON line: {"procs":N, "cost_multi":..., "cost_single":...,
"parity_pct":..., "ok":true}.
"""

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def worker(rank: int, nproc: int, port: int, args) -> None:
    # virtual device count must be set before the backend initializes;
    # the axon plugin ignores JAX_PLATFORMS env, so CPU is forced via
    # jax.config (see CLAUDE.md / tests/conftest.py)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from xrsfm_tpu.parallel import mesh as pmesh

    n_procs, pid = pmesh.initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=rank,
    )
    assert n_procs == nproc and pid == rank, (n_procs, pid)
    mesh = pmesh.make_pod_mesh()  # (dcn=nproc, ici=local devices)
    assert mesh.shape["dcn"] == nproc, mesh.shape
    assert mesh.shape["ici"] == jax.local_device_count(), mesh.shape

    import bench  # deterministic problem builder (same on every rank)
    from xrsfm_tpu.parallel import dist_ba

    prob, _ell, n_obs = bench.make_ba_problem(
        args.cams, args.pts, args.obs_per_pt, seed=args.seed
    )
    stats = {}
    _, cost = dist_ba.solve_distributed(
        mesh, prob, max_iters=args.iters, axis=("dcn", "ici"),
        stats=stats,
    )
    if rank == 0:
        print(json.dumps({
            "n_obs": int(n_obs),
            "initial_cost": stats["initial_cost"],
            "final_cost": stats["final_cost"],
        }), flush=True)


def launch(nproc: int, port: int, args, total_devices: int = 8) -> dict:
    """Spawn nproc worker copies of this script; return rank-0's JSON.

    The TOTAL device count stays fixed across process counts (8 =
    2 procs x 4 or 1 proc x 8) so the observation table shards
    identically and the parity gate compares like with like — only the
    process boundary (and hence the Gloo/DCN leg of the psums) moves."""
    env = dict(os.environ)
    per = max(1, total_devices // nproc)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={per}"
    env.pop("JAX_PLATFORMS", None)
    procs = []
    for r in range(nproc):
        cmd = [
            sys.executable, os.path.abspath(__file__),
            "--worker_rank", str(r), "--procs", str(nproc),
            "--port", str(port),
            "--cams", str(args.cams), "--pts", str(args.pts),
            "--obs_per_pt", str(args.obs_per_pt),
            "--iters", str(args.iters), "--seed", str(args.seed),
        ]
        procs.append(subprocess.Popen(
            cmd, env=env, cwd=ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = [p.communicate(timeout=900) for p in procs]
    for r, (p, (out, err)) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            sys.stderr.write(
                f"--- rank {r} rc={p.returncode}\n{out}\n{err}\n"
            )
            raise RuntimeError(f"worker rank {r} failed")
    line = [ln for ln in outs[0][0].splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def _free_port() -> int:
    import socket

    with socket.socket() as s:  # free localhost port for the coordinator
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _compare(args) -> dict:
    """Run multi-process vs single-process at args' parameters; return
    the parity record (gate 1%; the deterministic reduction in
    parallel/dist_ba makes the two bit-identical in practice)."""
    multi = launch(args.procs, _free_port(), args)
    single = launch(1, _free_port(), args)
    parity = abs(multi["final_cost"] - single["final_cost"]) / max(
        single["final_cost"], 1e-9
    )
    return {
        "procs": args.procs,
        "cams": args.cams,
        "pts": args.pts,
        "iters": args.iters,
        "seed": args.seed,
        "n_obs": multi["n_obs"],
        "cost_multi": multi["final_cost"],
        "cost_single": single["final_cost"],
        "parity_pct": round(100.0 * parity, 4),
        "ok": bool(parity < 0.01),
    }


# (cams, pts, iters) sweep — includes the r4 judge's failing point
# (30/2000/5: 4.02% parity under psum reduction) and the nominal slow-
# test point (40/4000/8)
SWEEP_SIZES = [(30, 2000, 5), (40, 4000, 8), (25, 1500, 6), (60, 6000, 5),
               (50, 3000, 10)]
SWEEP_SEEDS = [0, 7]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--cams", type=int, default=50)
    ap.add_argument("--pts", type=int, default=5000)
    ap.add_argument("--obs_per_pt", type=int, default=7)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--worker_rank", type=int, default=-1)
    ap.add_argument("--sweep", action="store_true",
                    help="run the 5-size x 2-seed parity sweep")
    args = ap.parse_args()

    if args.worker_rank >= 0:
        worker(args.worker_rank, args.procs, args.port, args)
        return

    if args.sweep:
        records = []
        for cams, pts, iters in SWEEP_SIZES:
            for seed in SWEEP_SEEDS:
                args.cams, args.pts, args.iters, args.seed = (
                    cams, pts, iters, seed
                )
                rec = _compare(args)
                records.append(rec)
                print(json.dumps(rec), flush=True)
        out = {
            "sweep": len(records),
            "max_parity_pct": max(r["parity_pct"] for r in records),
            "ok": all(r["ok"] for r in records),
        }
        print(json.dumps(out), flush=True)
        if not out["ok"]:
            sys.exit(1)
        return

    out = _compare(args)
    print(json.dumps(out), flush=True)
    if not out["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
