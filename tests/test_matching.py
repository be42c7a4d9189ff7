import numpy as np
import jax.numpy as jnp

from xrsfm_tpu.ops import matching as dmatch
from xrsfm_tpu.feature import matching as fmatch
from xrsfm_tpu.utils.io_features import FrameFeatures

from synthetic import make_scene


def quantize_desc(v):
    """float L1-root-normalized descriptor -> uint8, 512*v truncation
    (reference: FeatureDescriptorsToUnsignedByte, sift_extractor.h:22-34)."""
    return np.minimum(512.0 * v, 255.0).astype(np.uint8)


def random_descriptors(rng, n):
    d = np.abs(rng.normal(size=(n, 128))).astype(np.float32)
    d /= d.sum(-1, keepdims=True)  # L1
    d = np.sqrt(d)  # root -> L2 normalized
    return d


def test_match_descriptors_identity():
    rng = np.random.default_rng(0)
    d = random_descriptors(rng, 100)
    du = quantize_desc(d)
    perm = rng.permutation(100)
    m, dists = dmatch.match_pair_host(du, du[perm])
    # every feature should match its permuted copy
    assert len(m) == 100
    assert (perm[m[:, 0]] == perm[perm[m[:, 1]]]).all() or (
        m[:, 1] == np.argsort(perm)[m[:, 0]]
    ).all()


def test_match_descriptors_rejects_ambiguous():
    rng = np.random.default_rng(1)
    d = random_descriptors(rng, 64)
    du = quantize_desc(d)
    # second set: duplicate each descriptor twice -> ratio test must reject
    d2 = np.repeat(du, 2, axis=0)
    m, _ = dmatch.match_pair_host(du, d2)
    assert len(m) < 5  # nearly everything ambiguous


def test_match_descriptors_respects_masks():
    rng = np.random.default_rng(2)
    d1 = quantize_desc(random_descriptors(rng, 32))
    m, _ = dmatch.match_pair_host(d1, d1)
    assert len(m) == 32
    assert (m[:, 0] == m[:, 1]).all()


def _features_from_scene(s, noise=0.0, seed=0):
    """Build FrameFeatures with descriptors shared per 3D point."""
    rng = np.random.default_rng(seed)
    n_cams, n_pts = s["uv"].shape[:2]
    base = random_descriptors(rng, n_pts)
    feats = []
    perms = []
    for i in range(n_cams):
        uv_px = s["uv"][i] * 500.0 + np.array([320, 240], np.float32)
        perm = rng.permutation(n_pts)
        d = base[perm] + rng.normal(scale=noise, size=(n_pts, 128))
        d = np.abs(d)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        kp = np.zeros((n_pts, 4), np.float32)
        kp[:, :2] = uv_px[perm]
        feats.append(
            FrameFeatures(
                name=f"im{i}.png",
                keypoints=kp,
                descriptors=quantize_desc(d),
            )
        )
        perms.append(perm)
    return feats, perms


def test_match_and_verify_pipeline():
    s = make_scene(n_cams=3, n_pts=120, seed=5)
    feats, perms = _features_from_scene(s, noise=0.01)
    pairs = fmatch.sequential_pairs(3, fmatch.MatchingOptions(seq_window=3))
    out = fmatch.match_and_verify_pairs(feats, pairs, verbose=False)
    assert len(out) >= 2
    for p in out:
        # verified pairs should have many inliers (clean synthetic data)
        assert p.inlier_num > 60
        # inlier matches must be geometrically consistent with GT
        # correspondence: feature k in frame i is 3D point perms[i][k]
        pt1 = perms[p.id1][p.matches[p.inlier_mask][:, 0]]
        pt2 = perms[p.id2][p.matches[p.inlier_mask][:, 1]]
        frac_correct = np.mean(pt1 == pt2)
        assert frac_correct > 0.95, frac_correct


def test_fused_pallas_matcher_matches_xla_path():
    """The fused Pallas kernel (interpret mode on CPU) must agree with
    the XLA fallback exactly: same accepted set, same counts, same
    distances (both compute the identical raw uint8 dot products)."""
    rng = np.random.default_rng(11)
    N = 256  # pallas-eligible: multiples of 128, D=128
    d1 = quantize_desc(random_descriptors(rng, N))
    d2 = quantize_desc(random_descriptors(rng, N))
    # overlap half the features so there are real matches
    d2[: N // 2] = d1[: N // 2]
    m1 = np.ones(N, bool)
    m2 = np.ones(N, bool)
    m1[-7:] = False  # exercise masking
    m2[-3:] = False
    assert dmatch._pallas_ok(N, N, 128)

    mf, cf, df = dmatch._match_batch_fused(
        jnp.asarray(d1)[None], jnp.asarray(d2)[None],
        jnp.asarray(m1)[None], jnp.asarray(m2)[None], 0.7, 0.8, 256,
    )
    mx, cx, dx = dmatch._match_descriptors_xla(
        jnp.asarray(d1), jnp.asarray(d2),
        jnp.asarray(m1), jnp.asarray(m2), 0.7, 0.8, 256,
    )
    assert int(cf[0]) == int(cx)
    got = {tuple(r) for r in np.asarray(mf[0]) if r[0] >= 0}
    exp = {tuple(r) for r in np.asarray(mx) if r[0] >= 0}
    assert got == exp and len(got) == int(cx)
    dmap_f = {tuple(r): float(v)
              for r, v in zip(np.asarray(mf[0]), np.asarray(df[0]))
              if r[0] >= 0}
    dmap_x = {tuple(r): float(v)
              for r, v in zip(np.asarray(mx), np.asarray(dx))
              if r[0] >= 0}
    for k in exp:
        assert abs(dmap_f[k] - dmap_x[k]) < 1e-5


def _hamming_brute(d1, d2):
    """Reference popcount distance matrix (numpy bit ops)."""
    b1 = np.unpackbits(d1, axis=1).astype(np.int32)  # [N,256]
    b2 = np.unpackbits(d2, axis=1).astype(np.int32)
    return (b1[:, None, :] != b2[None, :, :]).sum(-1)


def test_orb_hamming_matcher_matches_reference_semantics():
    """match_descriptors_hamming reproduces OrbMatch's accept rule
    (reference: src/feature/feature_processing.cc:171-219 — best <= 80,
    best <= 0.9 * second, mutual best)."""
    rng = np.random.default_rng(7)
    n = 120
    base = rng.integers(0, 256, size=(n, 32), dtype=np.uint8)
    # corrupt a few bits to create realistic near-matches
    perm = rng.permutation(n)
    d2 = base[perm].copy()
    flips = rng.integers(0, 2, size=d2.shape, dtype=np.uint8) & rng.integers(
        0, 2, size=d2.shape, dtype=np.uint8
    )
    d2 ^= flips & rng.integers(0, 4, size=d2.shape, dtype=np.uint8)

    got, dists = dmatch.match_pair_host_hamming(base, d2)

    # brute-force reference of the same accept rule
    D = _hamming_brute(base, d2)
    exp = []
    bj = D.argmin(1)
    bi = D.argmin(0)
    for i in range(n):
        j = bj[i]
        dsort = np.sort(D[i])
        if (
            D[i, j] <= 80
            and D[i, j] <= 0.9 * dsort[1]
            and bi[j] == i
        ):
            exp.append((i, j))
    exp = np.array(exp)
    got_set = {tuple(m) for m in got}
    exp_set = {tuple(m) for m in exp}
    assert got_set == exp_set, (len(got_set), len(exp_set))
    # distances returned in bits, exact
    Dmap = {tuple(m): D[m[0], m[1]] for m in exp}
    for m, dd in zip(got, dists):
        assert Dmap[tuple(m)] == int(round(float(dd)))
