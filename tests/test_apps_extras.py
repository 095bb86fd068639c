"""Tests for auxiliary apps: match extraction (SIFT fallback), video
rendering path factories, network GUI protocol."""

import json
import os
import socket
import threading
import time

import numpy as np
import pytest


def test_match_extraction_sift(tmp_path):
    """SIFT matcher on textured synthetic views produces MAGSAC-filtered
    normalized matches in the reference match_data.npy format."""
    import cv2

    from scgaussian_tpu.apps.get_match_info import extract_matches

    rng = np.random.default_rng(0)
    base = np.full((160, 200, 3), 40, np.uint8)
    for _ in range(120):  # structured texture: SIFT needs corners, not noise
        x, y = rng.integers(5, 195), rng.integers(5, 155)
        c = tuple(int(v) for v in rng.integers(60, 255, 3))
        if rng.random() < 0.5:
            cv2.circle(base, (x, y), int(rng.integers(3, 9)), c, -1)
        else:
            s = int(rng.integers(3, 10))
            cv2.rectangle(base, (x - s, y - s), (x + s, y + s), c, -1)
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    # simulate 10 shifted views of the same texture (homographies)
    for v in range(10):
        M = np.float32([[1, 0, -v * 3], [0, 1, -v * 2]])
        warped = cv2.warpAffine(base, M, (200, 160))
        cv2.imwrite(str(img_dir / f"v_{v:03d}.png"), warped)

    vis_dir = tmp_path / "vis"
    md = extract_matches(
        str(img_dir), str(tmp_path / "match_data.npy"), "sift", 500,
        vis_dir=str(vis_dir),
    )
    assert os.path.exists(tmp_path / "match_data.npy")

    # match visualization figures (reference get_match_info.py:413-417):
    # one {name0}_{name1}_match.png per pair, a 2-row side-by-side canvas
    # with green inlier dots + blended lines
    figs = sorted(os.listdir(vis_dir))
    assert len(figs) == 3 and all(f.endswith("_match.png") for f in figs)
    fig = cv2.imread(str(vis_dir / figs[0]))
    assert fig.shape == (2 * 160 + 3 * 2, 2 * 200 + 3 * 2, 3)
    # green inlier marks present (pure green pixels survive the 0.4 blend)
    g = (fig[:, :, 1].astype(int) - fig[:, :, 0]) > 80
    assert g.sum() > 50
    names = sorted(md.keys())
    assert len(names) == 3
    a, b = names[0], names[1]
    m_ab, m_ba = md[a][b], md[b][a]
    assert m_ab.shape == m_ba.shape and m_ab.shape[0] > 20
    assert (m_ab >= 0).all() and (m_ab <= 1).all()
    # shifted texture: matches differ by the known translation
    dx = (m_ba[:, 0] - m_ab[:, 0]) * 200
    assert abs(np.median(dx) - (-3 * (int(names[1].split("_")[1]) - int(names[0].split("_")[1])))) < 1.5


def test_tanks_video_path(tmp_path):
    from scgaussian_tpu.data.synthetic import generate_scene
    from scgaussian_tpu.data.readers import create_tanks_spiral

    d = tmp_path / "Tanks_scene"
    d.mkdir()
    generate_scene(str(d), n_views=10, n_gaussians=20, n_points=40, width=48, height=32)
    info = create_tanks_spiral(str(d))
    # 3 train views -> 2 segments x 30 poses, there and back = 120
    assert len(info.test_cameras) == 120
    c = info.test_cameras[0]
    assert c.image is None and c.width == 48


def test_network_gui_protocol():
    from scgaussian_tpu.viewer.network_gui import NetworkGUI

    gui = NetworkGUI(port=0)
    port = gui.listener.getsockname()[1]

    msg = {
        "resolution_x": 32,
        "resolution_y": 24,
        "train": True,
        "fov_y": 0.7,
        "fov_x": 0.9,
        "z_near": 0.01,
        "z_far": 100.0,
        "shs_python": False,
        "rot_scale_python": False,
        "keep_alive": True,
        "scaling_modifier": 1.0,
        "view_matrix": list(np.eye(4).flatten().astype(float)),
        "view_projection_matrix": list(np.eye(4).flatten().astype(float)),
    }

    received = {}

    def client():
        s = socket.create_connection(("127.0.0.1", port))
        payload = json.dumps(msg).encode()
        s.sendall(len(payload).to_bytes(4, "little") + payload)
        img = s.recv(32 * 24 * 3, socket.MSG_WAITALL)
        n = int.from_bytes(s.recv(4), "little")
        received["verify"] = s.recv(n).decode()
        received["img_len"] = len(img)
        s.close()

    t = threading.Thread(target=client)
    t.start()
    # non-blocking accept: poll with a real deadline — under a loaded
    # machine the client thread may take a while to get scheduled
    deadline = time.time() + 30.0
    while gui.conn is None and time.time() < deadline:
        gui.try_connect()
        time.sleep(0.01)
    assert gui.conn is not None, "viewer client never connected"
    cam, do_training, *_ = gui.receive()
    assert cam["width"] == 32 and do_training
    # y/z flip then transpose of identity stays sign-flipped identity
    assert cam["world_view"].shape == (4, 4)
    gui.send(bytes(32 * 24 * 3), "ok")
    t.join()
    assert received["verify"] == "ok"
    assert received["img_len"] == 32 * 24 * 3
    gui.close()


def test_llff_poses_bounds_and_spiral(tmp_path):
    """gen_poses writes poses_bounds.npy from COLMAP; the LLFF spiral video
    factory consumes it and yields 180 consistent cameras."""
    from scgaussian_tpu.data.synthetic import generate_scene
    from scgaussian_tpu.data.pose_utils import gen_poses
    from scgaussian_tpu.data.readers import create_llff_spiral

    d = tmp_path / "llffscene"
    d.mkdir()
    generate_scene(str(d), n_views=8, n_gaussians=20, n_points=60, width=48, height=36)
    gen_poses(str(d))
    pb = np.load(d / "poses_bounds.npy")
    assert pb.shape == (8, 17)
    assert (pb[:, -2] < pb[:, -1]).all()  # near < far

    info = create_llff_spiral(str(d))
    assert len(info.test_cameras) == 180
    c = info.test_cameras[0]
    assert c.width == 48 and c.height == 36
    # rotations orthonormal
    R = c.R
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_safe_state_stamps_and_seeds(capsys):
    """safe_state analog (`utils/general_utils.py:118-139`): timestamps
    complete lines, seeds numpy, returns a jax key; restore stdout after."""
    import sys
    import numpy as np

    from scgaussian_tpu.utils.logging import safe_state

    old = sys.stdout
    try:
        key = safe_state(silent=False, seed=0)
        print("hello")
        a = np.random.rand()
    finally:
        sys.stdout = old
    captured = capsys.readouterr().out
    assert "hello [" in captured and captured.rstrip().endswith("]")
    np.random.seed(0)
    assert np.random.rand() == a  # numpy got seeded
    assert key is not None
