"""Mechanical headline-vs-artifact check (r4 verdict weak #1).

Every perf number in docs/benchmark.md that claims to be a recorded
value carries an inline marker ``<!--bench:ARTIFACT:field.path-->``
immediately after the bolded number.  This test extracts each
(number, artifact, field) triple and diffs the number against the
recorded artifact JSON: headline drift (r2 "37-40", r3 "65-71",
r4 "87.7") cannot ship a fourth time.

The test also pins the set of fields that MUST carry a marker for the
newest recorded artifact present in the repo, so a future edit cannot
dodge the check by deleting the marker.
"""

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOC = os.path.join(REPO, "docs", "benchmark.md")

# **<number>x?** optionally followed by trailing words inside the bold,
# then the marker comment.
_MARKED = re.compile(
    r"\*\*([0-9][0-9.,]*)(?:x|%|[^*]*?)?\*\*<!--bench:([A-Za-z0-9_]+):([A-Za-z0-9_.]+)-->"
)


def _lookup(artifact_path, dotted):
    with open(artifact_path) as f:
        data = json.load(f)
    node = data.get("parsed", data)
    # the artifact's top-level metric is stored as {"metric": name,
    # "value": v}, not as a key
    if dotted == node.get("metric"):
        return float(node["value"])
    for part in dotted.split("."):
        node = node[part]
    return float(node)


def _claims():
    with open(DOC) as f:
        text = f.read()
    out = []
    for m in _MARKED.finditer(text):
        out.append((float(m.group(1).replace(",", "")), m.group(2), m.group(3)))
    return out


def test_marked_headlines_match_artifacts():
    claims = _claims()
    assert claims, "no marked headline numbers found in docs/benchmark.md"
    for value, artifact, field in claims:
        path = os.path.join(REPO, artifact + ".json")
        assert os.path.exists(path), f"marker cites missing artifact {artifact}"
        recorded = _lookup(path, field)
        # docs may round (79.477 -> 79.5); accept <=1% relative slack,
        # far below the r2/r4 drift magnitudes (30-60%).
        assert abs(value - recorded) <= 0.01 * max(abs(recorded), 1e-9), (
            f"docs/benchmark.md claims {value} for {artifact}:{field} "
            f"but the artifact records {recorded}"
        )


def test_latest_artifact_fields_are_marked():
    # one-round grace: the end-of-round artifact is written by the
    # driver AFTER the round's commits, so docs can only cite it in the
    # NEXT round — the newest OR second-newest artifact must be the
    # headline.
    benches = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    assert benches
    accept = {
        os.path.splitext(os.path.basename(b))[0] for b in benches[-2:]
    }
    marked = {(a, f) for _, a, f in _claims()}
    required = {
        "ba_lm_iters_per_s",
        "secondary.ba_large_iters_per_s",
        "secondary.sift_images_per_s_480p",
        "vs_baseline",
    }
    missing = {
        f for f in required
        if not any((a, f) in marked for a in accept)
    }
    assert not missing, (
        f"docs/benchmark.md must headline one of the newest recorded "
        f"artifacts {sorted(accept)}: fields without a marker: "
        f"{sorted(missing)}"
    )
