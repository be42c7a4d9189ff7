import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from xrsfm_tpu.utils import view


def test_draw_features_and_matches(tmp_path):
    img1 = np.zeros((120, 160), np.uint8)
    img2 = np.zeros((100, 140), np.uint8)
    kps1 = np.array([[10.0, 20.0], [50.0, 60.0], [100.0, 30.0]])
    kps2 = np.array([[15.0, 25.0], [55.0, 65.0]])
    out = view.draw_features(img1, kps1, tmp_path / "f.png")
    assert out.shape == (120, 160, 3)
    assert (tmp_path / "f.png").exists()
    # green dot at each keypoint
    assert tuple(out[20, 10]) == (0, 255, 0)

    matches = np.array([[0, 0], [1, 1], [2, 0]])
    mask = np.array([True, True, False])
    canvas = view.draw_matches(img1, img2, kps1, kps2, matches, mask,
                               tmp_path / "m.png")
    assert canvas.shape == (120, 300, 3)
    assert (tmp_path / "m.png").exists()

    flow = view.draw_feature_flow(img1, kps1, kps1 + 3.0, matches[:2])
    assert flow.shape == (120, 160, 3)


def test_export_ply(tmp_path):
    pts = np.random.default_rng(0).normal(size=(50, 3))
    q = np.tile([1.0, 0, 0, 0], (3, 1))
    t = np.zeros((3, 3))
    t[:, 2] = [0.0, 1.0, 2.0]
    path = tmp_path / "cloud.ply"
    view.export_ply(path, pts, cam_q=q, cam_t=t)
    text = path.read_text().splitlines()
    assert text[0] == "ply"
    n = int([l for l in text if l.startswith("element vertex")][0].split()[-1])
    assert n == 50 + 3 * 5
    body = [l for l in text[text.index("end_header") + 1:] if l]
    assert len(body) == n
    # camera frustum vertices are red
    assert body[-1].endswith("255 0 0")
