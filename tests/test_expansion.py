"""EC-SfM covisibility match expansion on synthetic features."""

import numpy as np
import pytest

from xrsfm_tpu.feature import expansion as EXP
from xrsfm_tpu.feature import matching as fmatch
from xrsfm_tpu.utils.io_features import FrameFeatures

from synthetic import make_scene
from test_matching import _features_from_scene


def _retrieval_from_gt(s):
    """Rank frames by camera-center distance (stand-in for NetVLAD)."""
    import jax.numpy as jnp

    from xrsfm_tpu.utils import geometry as G

    c = np.asarray(G.pose_center(jnp.asarray(s["q"]), jnp.asarray(s["t"])))
    n = len(c)
    id2rank = {}
    for i in range(n):
        d = np.linalg.norm(c - c[i], axis=1)
        id2rank[i] = [int(j) for j in np.argsort(d) if j != i]
    return id2rank


@pytest.mark.slow
def test_covisibility_matching_expands_pairs():
    n_cams = 8
    s = make_scene(n_cams=n_cams, n_pts=140, seed=31)
    feats, perms = _features_from_scene(s, noise=0.01, seed=31)
    id2rank = _retrieval_from_gt(s)
    # seed with only top-2 retrieval pairs; expansion must find more
    out = EXP.covisibility_matching(
        feats, id2rank,
        fmatch.MatchingOptions(),
        num_iterations=3,
        init_topk=2,
        verbose=False,
    )
    n_seed = len(fmatch.retrieval_pairs(id2rank, 2))
    assert len(out) > n_seed, (len(out), n_seed)
    # all verified pairs must be mostly-correct correspondences
    for p in out:
        pt1 = perms[p.id1][p.matches[p.inlier_mask][:, 0]]
        pt2 = perms[p.id2][p.matches[p.inlier_mask][:, 1]]
        assert np.mean(pt1 == pt2) > 0.9


def test_simulation_sfm_marks_registrable():
    s = make_scene(n_cams=6, n_pts=120, seed=32)
    feats, _ = _features_from_scene(s, noise=0.01, seed=32)
    pairs = fmatch.sequential_pairs(6, fmatch.MatchingOptions(seq_window=3))
    verified = fmatch.match_and_verify_pairs(feats, pairs, verbose=False)
    mm = EXP.MatchMapLite(feats)
    for p in verified:
        mm.add_pair(p)
    init = EXP.get_init_id(verified)
    reg = mm.simulate_sfm(init, threshold=30)
    # the whole sequence shares tracks -> everything registrable
    assert len(reg) == 6
    connected = mm.connected_frames(init[0])
    assert len(connected) == 6


def test_simulation_sfm_matches_bruteforce_greedy():
    """The lazy-heap incremental-counter SimulationSfM must reproduce the
    reference greedy (full rescan each round: register the unregistered
    frame with the most triangulated tracks, ties to the lowest id,
    stop when none reaches the threshold) EXACTLY, registered-set and
    all (match_expansion.cc:534-601)."""
    import numpy as np

    def brute(mm, init_pair, threshold):
        ft = {f: mm.frame_tracks(f) for f in range(mm.nf)}
        tri, registered = set(), set(init_pair)
        for f in init_pair:
            tri.update(ft[f].keys())
        while True:
            best, best_cnt = -1, threshold - 1
            for f in range(mm.nf):
                if f in registered:
                    continue
                cnt = sum(1 for r in ft[f] if r in tri)
                if cnt > best_cnt:
                    best, best_cnt = f, cnt
            if best < 0:
                return registered
            registered.add(best)
            tri.update(ft[best].keys())

    rng = np.random.default_rng(7)
    for trial in range(5):
        nf = 12
        n_kp = 40
        feats = [
            __import__("xrsfm_tpu.utils.io_features", fromlist=["x"])
            .FrameFeatures(
                f"f{i}",
                np.column_stack([
                    rng.uniform(0, 640, n_kp), rng.uniform(0, 480, n_kp),
                    np.ones(n_kp), np.zeros(n_kp),
                ]).astype(np.float32),
                np.zeros((n_kp, 128), np.uint8),
            )
            for i in range(nf)
        ]
        mm = EXP.MatchMapLite(feats)
        from xrsfm_tpu.utils.io_features import FramePairData

        for _ in range(20):
            i, j = sorted(rng.choice(nf, 2, replace=False))
            n = int(rng.integers(3, 15))
            a = rng.choice(n_kp, n, replace=False).astype(np.int32)
            b = rng.choice(n_kp, n, replace=False).astype(np.int32)
            p = FramePairData(
                int(i), int(j), np.column_stack([a, b]),
                np.zeros(n), np.eye(3), n, np.ones(n, bool),
            )
            mm.add_pair(p)
        for th in (2, 5, 10):
            got = mm.simulate_sfm((0, 1), th)
            want = brute(mm, (0, 1), th)
            assert got == want, (trial, th, sorted(got), sorted(want))


def test_incremental_components_match_batch():
    """Pairs added across iterations must yield the same component
    partition as one batch build (the incremental label-graph merge in
    MatchMapLite._components)."""
    import numpy as np
    from xrsfm_tpu.feature.expansion import MatchMapLite
    from xrsfm_tpu.utils.io_features import FrameFeatures, FramePairData

    rng = np.random.default_rng(0)
    nf, nk = 12, 40
    feats = [
        FrameFeatures(
            f"f{i}", rng.uniform(0, 100, (nk, 4)).astype(np.float32),
            np.zeros((nk, 128), np.uint8),
        )
        for i in range(nf)
    ]

    def make_pairs(seed):
        r = np.random.default_rng(seed)
        out = []
        for _ in range(30):
            a, b = sorted(r.choice(nf, 2, replace=False))
            m = np.stack([r.choice(nk, 12, replace=False),
                          r.choice(nk, 12, replace=False)], 1)
            out.append(FramePairData(
                id1=int(a), id2=int(b), matches=m.astype(np.int32),
                distances=np.zeros(len(m)), E=np.eye(3),
                inlier_num=len(m), inlier_mask=np.ones(len(m), bool),
            ))
        return out

    pairs = make_pairs(7)
    mm_inc = MatchMapLite(feats)
    # interleave adds with _components() calls (forces incremental path)
    for i, p in enumerate(pairs):
        mm_inc.add_pair(p)
        if i % 7 == 0:
            mm_inc._components()
    nodes_i, lab_i = mm_inc._components()

    mm_all = MatchMapLite(feats)
    for p in pairs:
        mm_all.add_pair(p)
    nodes_b, lab_b = mm_all._components()

    assert np.array_equal(nodes_i, nodes_b)
    # same partition up to relabeling
    import collections
    part_i = collections.defaultdict(set)
    part_b = collections.defaultdict(set)
    for n, l in zip(nodes_i, lab_i):
        part_i[int(l)].add(int(n))
    for n, l in zip(nodes_b, lab_b):
        part_b[int(l)].add(int(n))
    assert sorted(map(sorted, part_i.values())) == \
        sorted(map(sorted, part_b.values()))
