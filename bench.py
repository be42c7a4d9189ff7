"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: Schur-LM bundle-adjustment iterations/s per chip on a
KITTI-scale synthetic problem (200 cameras, 20k points, ~140k
observations) — the dominant cost of the reference's reconstruction stage
(SURVEY.md §3.2: LBA/KGBA Ceres solves dominate; reference runs Ceres
SPARSE_SCHUR with 8 CPU threads, src/optimization/ba_solver.cc:70-77).

vs_baseline divides by a MEASURED CPU anchor: the same solver on this
host's 2 vCPUs (secondary.cpu_anchor_iters_per_s; baseline_kind says
which denominator was used — the documented 10-iters/s Ceres estimate
is only the fallback if the CPU-anchor subprocess fails).  A second
size point (~1k cameras / ~1M observations) stresses the Schur design
at scale; tunnel_overhead_s / tunnel_degraded expose when the axon
tunnel's per-dispatch latency — not the chip — bounds the number.

Also reports secondary metrics inside the JSON line: descriptor-matching
pair throughput (the matching stage's hot op) and the BA problem's
observation count / final cost (so the headline number is auditable —
faster iterations that no longer converge would show up here).
"""

import json
import time

import numpy as np


def make_ba_problem(n_cams=200, n_pts=20000, obs_per_pt=7, seed=0,
                    cam_width=128, pt_width=32):
    """Synthetic KITTI-scale BA problem; returns (packed problem, ell,
    n_obs).  Shared by bench_ba and scripts/profile_ba.py."""
    import jax.numpy as jnp

    from xrsfm_tpu.optim import ba as ba_mod
    from xrsfm_tpu.optim.ba import BAProblem
    from xrsfm_tpu.utils import camera as C

    rng = np.random.default_rng(seed)
    f, cx, cy = 718.0, 607.0, 185.0  # KITTI-ish intrinsics
    # forward-motion trajectory (cameras at identity rotation, Tcw t = -c)
    centers = np.cumsum(
        rng.normal(scale=[0.15, 0.02, 0.05], size=(n_cams, 3)), axis=0
    )
    centers[:, 2] += np.arange(n_cams) * 1.0
    qs = np.zeros((n_cams, 4))
    qs[:, 0] = 1.0
    ts = -centers
    # points sampled inside the anchor camera's frustum (realistic
    # conditioning: bounded FOV, positive depth)
    anchor = rng.integers(0, n_cams, n_pts)
    uv_n = rng.uniform(-0.4, 0.4, size=(n_pts, 2))
    depth = rng.uniform(5.0, 40.0, size=(n_pts, 1))
    xyz = centers[anchor] + depth * np.concatenate(
        [uv_n, np.ones((n_pts, 1))], axis=1
    )
    # observations: nearby cameras that actually see the point
    cam_list, pt_list = [], []
    for k in range(obs_per_pt):
        cams = np.clip(anchor - obs_per_pt // 2 + k, 0, n_cams - 1)
        cam_list.append(cams)
        pt_list.append(np.arange(n_pts))
    obs_cam = np.concatenate(cam_list).astype(np.int32)
    obs_pt = np.concatenate(pt_list).astype(np.int32)
    pc = xyz[obs_pt] - centers[obs_cam]
    proj = pc[:, :2] / np.maximum(pc[:, 2:3], 1e-6)
    good = (pc[:, 2] > 1.0) & (np.abs(proj) < 0.6).all(axis=1)
    obs_cam, obs_pt, pc = obs_cam[good], obs_pt[good], pc[good]
    uv = pc[:, :2] / pc[:, 2:3] * f + np.array([cx, cy])
    uv += rng.normal(scale=0.5, size=uv.shape)

    intri = np.tile(C.canonicalize_params(C.PINHOLE, [f, f, cx, cy]), (n_cams, 1))
    fix_cam = np.zeros(n_cams, bool)
    fix_cam[0] = True
    fix_trans = np.zeros(n_cams, bool)
    fix_trans[1] = True
    prob = BAProblem(
        cam_q=jnp.asarray(qs, jnp.float32),
        cam_t=jnp.asarray(ts, jnp.float32),
        cam_intri=jnp.asarray(intri, jnp.float32),
        points=jnp.asarray(xyz + rng.normal(scale=0.05, size=xyz.shape), jnp.float32),
        obs_uv=jnp.asarray(uv, jnp.float32),
        obs_cam=jnp.asarray(obs_cam),
        obs_pt=jnp.asarray(obs_pt),
        obs_w=jnp.ones(len(obs_cam), jnp.float32),
        fix_cam=jnp.asarray(fix_cam),
        fix_trans=jnp.asarray(fix_trans),
        fix_pt=jnp.zeros(n_pts, bool),
    )

    # production path: camera-major packed table (camera-side ELL rows are
    # contiguous reshapes; only the point-side transpose-gather remains)
    prob, ell = ba_mod.pack_camera_major(
        prob, cam_width=cam_width, pt_width=pt_width
    )
    return prob, ell, len(obs_cam)


def bench_ba(n_cams=200, n_pts=20000, obs_per_pt=7, iters=30, seed=0,
             cg_iters=2, cam_width=128):
    import jax
    import jax.numpy as jnp

    from xrsfm_tpu.optim import ba as ba_mod

    prob, ell, n_obs = make_ba_problem(n_cams, n_pts, obs_per_pt, seed,
                                       cam_width=cam_width)

    @jax.jit
    def lm_step(p, lam):
        """Full accept/reject LM step (fixed work per call), row-native
        layout (camera data fetched per ELL row, not per observation)."""
        w_row = p.obs_w.reshape(ell.cam.slots.shape)
        r, z, Jc, Jp = ba_mod._residuals_and_jacobians_rows(p, ell)
        cost, w = ba_mod._robust_cost_and_weight(r, z, w_row, 4.0)
        # production path (solve_ba): camera side from the row-native
        # pass; point side recomputed natively in point order — no
        # transpose gather of obs-sized Jacobians; √w-scaled Jcw shared
        # with the Schur solve (weighted-operand mode)
        U, bc, camw = ba_mod._build_normal_blocks_ell(
            p, ell, r, Jc, Jp, w, cam_only=True, return_cam_w=True
        )
        V, bp, ptg = ba_mod._build_pt_blocks_native(p, ell, 4.0)
        # truncated inexact Newton: 2 PCG iterations on the reduced camera
        # system reach the same 30-step final cost as 3, 4, 6, 12 or 50
        # on this problem (measured r3 on-chip: 54553/54553/54542 for cg
        # in {2,3,4}; band 54536-54555 across r1-r3 configs); the LM
        # outer loop absorbs the looser inner solves.
        dx_c, dx_p = ba_mod._schur_solve_ell(
            p, ell, U, V, bc, bp, Jc, Jp, w, lam, cg_iters, 1e-2,
            pt_gathers=ptg, cam_w=camw,
        )
        cand = ba_mod._apply_step(p, dx_c, dx_p)
        r2, z2 = ba_mod._residuals_only_rows(cand, ell)
        c2, _ = ba_mod._robust_cost_and_weight(r2, z2, w_row, 4.0)
        accept = c2 < cost
        out = ba_mod._select_accept(accept, p, cand)
        lam2 = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-10, 1e8)
        return out, lam2, jnp.where(accept, c2, cost)

    # The full LM loop runs inside ONE jit via lax.scan, exactly like the
    # production solver (optim/ba.solve_ba runs its loop in-jit too) —
    # per-step Python dispatch would otherwise dominate on the tunneled
    # axon platform, whose round-trip latency grows over long sessions.
    import functools

    @functools.partial(jax.jit, static_argnames=("length",))
    def lm_run(p, lam, length):
        def body(carry, _):
            p_, lam_, _ = carry
            p2, lam2, cost = lm_step(p_, lam_)
            return (p2, lam2, cost), None

        (p2, lam2, cost), _ = jax.lax.scan(
            body, (p, lam, jnp.float32(0.0)), None, length=length
        )
        return p2, lam2, cost

    # NOTE: on the axon TPU platform jax.block_until_ready does NOT block;
    # a scalar host fetch is the only reliable barrier, so timing brackets
    # use float(cost).
    #
    # The tunnel adds a fixed per-dispatch overhead that GROWS over long
    # sessions (measured: the same 30-iter run is ~0.76 s early and
    # ~1.5 s hours later at identical final cost).  Timing one run would
    # fold that overhead into the metric, so the headline iters/s is the
    # DIFFERENCE between a 2N-iter and an N-iter run — fixed dispatch +
    # fetch overhead cancels exactly and what remains is device LM
    # throughput.
    lam = jnp.float32(1e-4)

    def timed(length, reps=3):
        _, _, cost = lm_run(prob, lam, length)  # compile + warm-up
        final = float(cost)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _, _, cost = lm_run(prob, lam, length)
            float(cost)  # host fetch = sync barrier
            best = min(best, time.perf_counter() - t0)
        return best, final

    t_n, final_cost = timed(iters)
    t_2n, _ = timed(2 * iters)
    dt = max(t_2n - t_n, 1e-6)
    # fixed dispatch+fetch overhead per run — the tunnel's share; grows
    # over long sessions and is the telltale of a degraded tunnel
    overhead = max(2.0 * t_n - t_2n, 0.0)
    return iters / dt, n_obs, final_cost, overhead


def bench_matching(n_feats=4096, batch=16, reps=10, seed=0):
    """Production-path matcher throughput: fused Pallas kernel, pairs
    batched as in feature/matching.match_and_verify_pairs."""
    import jax
    import jax.numpy as jnp

    from xrsfm_tpu.ops import matching as dmatch

    rng = np.random.default_rng(seed)
    d = rng.integers(0, 90, size=(2, batch, n_feats, 128), dtype=np.uint8)
    d1 = jnp.asarray(d[0])
    d2 = jnp.asarray(d[1])
    m = jnp.ones((batch, n_feats), bool)
    out = dmatch.match_descriptors_batch(d1, d2, m, m)  # compile
    int(out[1][0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = dmatch.match_descriptors_batch(d1, d2, m, m)
    int(out[1][0])  # host fetch = sync barrier (axon: block_until_ready no-op)
    dt = time.perf_counter() - t0
    return batch * reps / dt


def bench_sift(size=(480, 640), reps=6, seed=0):
    """SIFT extraction throughput (images/s) on the device — the
    reference's core native component is SiftGPU (3rdparty/SiftGPU/
    ProgramCU.cu); this measures its TPU replacement end-to-end
    (host pad -> device pyramid/DoG/orient/describe -> host fetch)."""
    from xrsfm_tpu.ops.sift import SiftExtractor, SiftOptions

    rng = np.random.default_rng(seed)
    # textured synthetic image (pure noise yields few stable keypoints;
    # smoothed noise gives a realistic detection load)
    img = rng.integers(0, 255, size=size).astype(np.float32)
    k = np.ones((5, 5), np.float32) / 25.0
    from numpy.lib.stride_tricks import sliding_window_view

    sw = sliding_window_view(np.pad(img, 2, mode="edge"), (5, 5))
    img = (sw * k).sum(axis=(2, 3)).astype(np.uint8)
    ex = SiftExtractor(SiftOptions(
        num_octaves=4, features_per_octave=1024, max_features=4096,
        first_octave=0,
    ))
    # production path: batched dispatch (pipelines/run_matching uses
    # extract_batch with 16-image chunks; per-image dispatch pays a
    # tunnel round-trip each).  Measured on-chip: B=16 is ~25% faster
    # than B=8; B=32 collapses (pyramid working set spills HBM
    # streaming).
    B = 16
    imgs = [img] * B
    out = ex.extract_batch(imgs, batch=B)  # compile + warm
    kps = out[0][0]
    t0 = time.perf_counter()
    for _ in range(reps):
        ex.extract_batch(imgs, batch=B)
    dt = time.perf_counter() - t0
    return B * reps / dt, len(kps)


def measure_cpu_anchor(timeout_s=420):
    """Measured SAME-solver CPU throughput on this host's 2 vCPUs — the
    real denominator for vs_baseline (no published reference number
    exists; an invented Ceres estimate was review finding r1-weak#2).
    Subprocess so the CPU backend can be selected before first backend
    use.  Returns iters/s or None."""
    import os
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from xrsfm_tpu import enable_compilation_cache\n"
        "enable_compilation_cache()\n"
        "import bench\n"
        "its, _, _, _ = bench.bench_ba(iters=4)\n"
        "print('CPU_ANCHOR', its)\n"
    ) % os.path.dirname(os.path.abspath(__file__))
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s,
        )
        for line in out.stdout.splitlines():
            if line.startswith("CPU_ANCHOR"):
                return float(line.split()[1])
    except Exception:
        pass
    return None


def run_benchmarks():
    ba_iters_per_s, n_obs, cost, overhead = bench_ba()
    # large size point: ~1k cameras / ~1M observations — where the Schur
    # design is actually stressed (review finding r1-weak#9)
    ba_large, n_obs_l, cost_l, _ = bench_ba(
        n_cams=1024, n_pts=160000, obs_per_pt=7, iters=12
    )
    pairs_per_s = bench_matching()
    sift_ips, sift_nkp = bench_sift()
    cpu_anchor = measure_cpu_anchor()
    if cpu_anchor and cpu_anchor > 0:
        vs_baseline = ba_iters_per_s / cpu_anchor
        baseline_kind = "measured_cpu_2vcpu_same_solver"
    else:
        vs_baseline = ba_iters_per_s / 10.0
        baseline_kind = "estimate_ceres_8thread_10its"
    # tunnel-health: the per-run fixed overhead should be a small
    # fraction of the measured compute window; flag loudly when not
    per_run_s = 30.0 / max(ba_iters_per_s, 1e-9)
    tunnel_degraded = overhead > max(3.0 * per_run_s, 2.0)
    result = {
        "metric": "ba_lm_iters_per_s",
        "value": round(ba_iters_per_s, 3),
        "unit": "LM iters/s (200 cams, 20k pts, ~140k obs)",
        "vs_baseline": round(vs_baseline, 3),
        "secondary": {
            "ba_large_iters_per_s": round(ba_large, 3),
            "ba_large_num_obs": int(n_obs_l),
            "ba_large_final_cost": round(cost_l, 2),
            "match_pairs_per_s_4096feat": round(pairs_per_s, 2),
            "sift_images_per_s_480p": round(sift_ips, 2),
            "sift_keypoints_per_image": int(sift_nkp),
            "ba_num_obs": int(n_obs),
            "ba_final_cost": round(cost, 2),
            "cpu_anchor_iters_per_s": (
                round(cpu_anchor, 3) if cpu_anchor else None
            ),
            "baseline_kind": baseline_kind,
            "tunnel_overhead_s": round(overhead, 3),
            "tunnel_degraded": bool(tunnel_degraded),
        },
    }
    if tunnel_degraded:
        import sys

        sys.stderr.write(
            "WARNING: tunnel per-dispatch overhead %.2fs dwarfs the "
            "compute window — the recorded number reflects the tunnel's "
            "mood, not the chip\n" % overhead
        )
    print(json.dumps(result), flush=True)


def main():
    """Run the benchmarks in a watchdogged child process.

    The axon tunnel client occasionally wedges at startup (the process
    sits in futex_wait at ~0% CPU forever).  Were that to happen here the
    driver would record NO benchmark for the round, so the parent
    launches a child (`--child`), kills it if no output appears within
    the watchdog window, and retries after a pause — printing the child's
    one JSON line on success."""
    import os
    import subprocess
    import sys

    if "--child" in sys.argv:
        run_benchmarks()
        return
    for attempt in range(4):
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"],
                capture_output=True, text=True, timeout=1500,
            )
            for line in out.stdout.splitlines():
                if line.startswith("{"):
                    print(line, flush=True)
                    return
            sys.stderr.write(out.stderr[-2000:] + "\n")
        except subprocess.TimeoutExpired:
            sys.stderr.write(f"bench attempt {attempt}: watchdog timeout "
                             "(tunnel wedge?), retrying\n")
        time.sleep(60)
    print(json.dumps({
        "metric": "ba_lm_iters_per_s", "value": 0.0,
        "unit": "LM iters/s (200 cams, 20k pts, ~140k obs)",
        "vs_baseline": 0.0,
        "secondary": {"error": "all bench attempts wedged on the tunnel"},
    }), flush=True)


if __name__ == "__main__":
    main()
