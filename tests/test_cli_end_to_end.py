"""Full-pipeline CLI test: train -> render -> metrics on the synthetic
COLMAP scene (the de-facto acceptance test, mirroring the reference's
empirical verification flow — SURVEY.md section 4)."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    from scgaussian_tpu.data.synthetic import generate_scene

    d = tmp_path_factory.mktemp("e2escene")
    generate_scene(str(d), n_views=10, n_gaussians=40, n_points=80, width=64, height=48)
    return str(d)


def test_train_render_metrics(scene_dir, tmp_path):
    from scgaussian_tpu.apps import metrics as metrics_app
    from scgaussian_tpu.apps import render as render_app
    from scgaussian_tpu.apps import train as train_app

    model_dir = str(tmp_path / "model")
    train_app.main(
        [
            "-s", scene_dir,
            "-m", model_dir,
            "-r", "1",
            "--eval",
            "--iterations", "40",
            "--init_iterations", "150",
            "--densify_from_iter", "10",
            "--densification_interval", "20",
            "--opacity_reset_interval", "1000",
            "--bg_capacity", "512",
            "--backend", "oracle",
            "--test_iterations", "40",
            "--save_iterations", "40",
        ]
    )
    pc = os.path.join(model_dir, "point_cloud", "iteration_40", "point_cloud.ply")
    assert os.path.exists(pc)
    assert os.path.exists(os.path.join(model_dir, "cfg_args.json"))
    assert os.path.exists(os.path.join(model_dir, "chkpnt40.npz"))
    # init stage artifacts (matchpoint cloud + sparse depths)
    init_dir = os.path.join(model_dir, "init_point_cloud", "iteration_150")
    assert os.path.exists(os.path.join(init_dir, "point_cloud_matchpoint.ply"))

    render_app.main(["-m", model_dir, "--iteration", "40", "--backend", "oracle"])
    test_dir = os.path.join(model_dir, "test", "ours_40")
    renders = os.listdir(os.path.join(test_dir, "renders"))
    assert len(renders) == 2  # 10 views -> test idx {0, 8}
    assert os.path.exists(os.path.join(test_dir, "depth", "color_00000.png"))
    assert os.path.exists(os.path.join(test_dir, "error_map", "00000.png"))
    assert os.path.exists(os.path.join(model_dir, "train", "point_cloud_color.ply"))

    metrics_app.main(["-m", model_dir, "--no_lpips"])
    with open(os.path.join(model_dir, "results.json")) as f:
        results = json.load(f)
    m = results["ours_40"]
    assert m["PSNR"] is not None and np.isfinite(m["PSNR"])
    assert 0 < m["SSIM"] <= 1
    with open(os.path.join(model_dir, "per_view.json")) as f:
        per_view = json.load(f)
    assert len(per_view["ours_40"]["PSNR"]) == 2


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from scgaussian_tpu.model import io as model_io
    from scgaussian_tpu.model.gaussians import create_model
    from scgaussian_tpu.train import optim

    rng = np.random.default_rng(0)
    nr = 16
    rayo = rng.normal(size=(nr, 3)).astype(np.float32)
    rayd = rng.normal(size=(nr, 3)).astype(np.float32)
    model = create_model(rayo, rayd, rng.uniform(1, 5, nr).astype(np.float32),
                         rng.uniform(size=(nr, 3)).astype(np.float32), 3, 1.0, bg_capacity=32)
    opt = optim.init(model.params)
    p = str(tmp_path / "ck.npz")
    model_io.save_checkpoint(p, model, opt, 123)
    m2, o2, it = model_io.load_checkpoint(p, model, opt)
    assert it == 123
    for a, b in zip(jax.tree_util.tree_leaves(model), jax.tree_util.tree_leaves(m2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ply_save_load_roundtrip(tmp_path):
    import jax.numpy as jnp

    from scgaussian_tpu.model import io as model_io
    from scgaussian_tpu.model.gaussians import create_model
    import dataclasses

    rng = np.random.default_rng(1)
    nr = 12
    rayd = rng.normal(size=(nr, 3)).astype(np.float32)
    rayd /= np.linalg.norm(rayd, axis=-1, keepdims=True)
    model = create_model(
        np.zeros((nr, 3), np.float32), rayd, rng.uniform(2, 5, nr).astype(np.float32),
        rng.uniform(size=(nr, 3)).astype(np.float32), 3, 1.0, bg_capacity=32,
    )
    # activate two bg slots
    model = dataclasses.replace(
        model,
        bg_alive=model.bg_alive.at[:2].set(True),
        params=dataclasses.replace(
            model.params,
            bg_xyz=model.params.bg_xyz.at[:2].set(jnp.asarray([[1.0, 2, 5], [0, 1, 4]])),
            bg_opacity=model.params.bg_opacity.at[:2].set(0.3),
        ),
    )
    path = str(tmp_path / "pc" / "point_cloud.ply")
    model_io.save_ply(model, path)
    m2 = model_io.load_ply(path, 3, bg_capacity=32)
    assert m2.num_ray == nr
    np.testing.assert_allclose(np.asarray(m2.params.zval), np.asarray(model.params.zval), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m2.rayd), rayd, rtol=1e-6)
    assert int(np.asarray(m2.bg_alive).sum()) == 2
    np.testing.assert_allclose(
        np.asarray(m2.params.bg_xyz[:2]), [[1.0, 2, 5], [0, 1, 4]], rtol=1e-6
    )
    # combined model renders the same xyz
    np.testing.assert_allclose(
        np.asarray(m2.get_xyz()[:nr]), np.asarray(model.get_xyz()[:nr]), rtol=1e-5
    )


def test_resume_from_checkpoint(scene_dir, tmp_path):
    """--start_checkpoint resumes the main stage without redoing init."""
    from scgaussian_tpu.apps import train as train_app

    model_dir = str(tmp_path / "model_resume")
    common = [
        "-s", scene_dir, "-m", model_dir, "-r", "1", "--eval",
        "--init_iterations", "100", "--densify_from_iter", "10000",
        "--bg_capacity", "256", "--backend", "oracle",
        "--test_iterations", "-1", "--save_iterations", "-1",
        "--opacity_reset_interval", "10000",
    ]
    train_app.main(common + ["--iterations", "10",
                             "--checkpoint_iterations", "10"])
    assert os.path.exists(os.path.join(model_dir, "chkpnt10.npz"))

    state = train_app.main(
        common
        + ["--iterations", "20", "--start_checkpoint",
           os.path.join(model_dir, "chkpnt10.npz")]
    )
    assert state.iteration == 20
    assert os.path.exists(os.path.join(model_dir, "chkpnt20.npz"))


def test_render_video_llff_spiral(scene_dir, tmp_path):
    """render_video CLI over the LLFF spiral path (poses_bounds.npy from
    gen_poses on the synthetic scene)."""
    from scgaussian_tpu.apps import render_video as rv_app
    from scgaussian_tpu.apps import train as train_app
    from scgaussian_tpu.data.pose_utils import gen_poses

    gen_poses(scene_dir)
    model_dir = str(tmp_path / "model_video")
    train_app.main([
        "-s", scene_dir, "-m", model_dir, "-r", "1", "--eval",
        "--iterations", "5", "--init_iterations", "50",
        "--densify_from_iter", "10000", "--bg_capacity", "128",
        "--backend", "oracle", "--test_iterations", "-1",
        "--save_iterations", "5", "--opacity_reset_interval", "10000",
    ])
    rv_app.main(["-m", model_dir, "-s", scene_dir, "--backend", "oracle",
                 "--max_frames", "12"])
    base = os.path.join(model_dir, "video", "ours_5")
    frames = [f for f in os.listdir(os.path.join(base, "frames")) if f.startswith("0")]
    assert len(frames) == 12
    assert os.path.getsize(os.path.join(base, "video_rgb.avi")) > 1000
    assert os.path.getsize(os.path.join(base, "video_depth.avi")) > 1000


def test_async_checkpointer(tmp_path):
    from scgaussian_tpu.model import io as model_io
    from scgaussian_tpu.model.gaussians import create_model
    from scgaussian_tpu.train import optim

    rng = np.random.default_rng(0)
    nr = 8
    model = create_model(
        rng.normal(size=(nr, 3)).astype(np.float32),
        rng.normal(size=(nr, 3)).astype(np.float32),
        rng.uniform(1, 5, nr).astype(np.float32),
        rng.uniform(size=(nr, 3)).astype(np.float32),
        3, 1.0, bg_capacity=16,
    )
    opt = optim.init(model.params)
    ck = model_io.AsyncCheckpointer()
    d = str(tmp_path / "async_ck")
    ck.save(d, model, opt, 77)
    ck.wait()
    m2, o2, it = ck.restore(d, model, opt)
    assert it == 77
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(model), jax.tree_util.tree_leaves(m2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_viewer_polled_during_training(scene_dir, tmp_path):
    """Live-viewer integration (reference `train.py:109-122`): a SIBR-style
    client connects to the --port listener, requests frames during training
    iterations, and receives rendered RGB bytes + the verify string."""
    import json as _json
    import socket
    import threading

    from scgaussian_tpu.apps import train as train_app

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    frames = []

    def client():
        import time

        deadline = time.time() + 120.0
        conn = None
        while conn is None and time.time() < deadline:
            try:
                conn = socket.create_connection(("127.0.0.1", port), timeout=1.0)
            except OSError:
                time.sleep(0.05)
        assert conn is not None, "never connected to training viewer"
        # create_connection's timeout sticks to the socket: a 1 s recv
        # timeout races the first viewer-render XLA compile (> 1 s on CPU),
        # killing this thread with the socket still open and deadlocking
        # training in its blocking recv. Generous timeout + guaranteed close.
        conn.settimeout(300.0)
        msg = {
            "resolution_x": 32, "resolution_y": 24,
            "train": True, "keep_alive": False,
            "fov_y": 0.7, "fov_x": 0.9, "z_near": 0.01, "z_far": 100.0,
            "shs_python": False, "rot_scale_python": False,
            "scaling_modifier": 1.0,
            "view_matrix": list(np.eye(4).flatten().astype(float)),
            "view_projection_matrix": list(np.eye(4).flatten().astype(float)),
        }
        payload = _json.dumps(msg).encode()
        try:
            for _ in range(3):  # three frames over consecutive iterations
                conn.sendall(len(payload).to_bytes(4, "little") + payload)
                img = conn.recv(32 * 24 * 3, socket.MSG_WAITALL)
                n = int.from_bytes(conn.recv(4, socket.MSG_WAITALL), "little")
                verify = conn.recv(n, socket.MSG_WAITALL).decode()
                frames.append((len(img), verify))
        finally:
            conn.close()  # unblocks the server even if this thread fails

    t = threading.Thread(target=client)
    t.start()
    model_dir = str(tmp_path / "model_viewer")
    train_app.main(
        [
            "-s", scene_dir, "-m", model_dir, "-r", "1",
            "--iterations", "30", "--init_iterations", "60",
            "--densify_from_iter", "1000", "--opacity_reset_interval", "1000",
            "--bg_capacity", "256", "--backend", "oracle",
            "--test_iterations", "-1", "--save_iterations", "-1",
            "--no_tensorboard", "--port", str(port),
        ]
    )
    t.join(timeout=60)
    assert not t.is_alive(), "viewer client hung"
    assert len(frames) == 3
    for img_len, verify in frames:
        assert img_len == 32 * 24 * 3
        assert verify == os.path.abspath(scene_dir)


def test_acceptance_harness_synthetic(tmp_path):
    """The one-command acceptance harness dry-runs end to end (train ->
    render -> metrics) on the synthetic scene (VERDICT round-1 item 8)."""
    from scgaussian_tpu.apps import acceptance

    model_dir = str(tmp_path / "acceptance_model")
    results = acceptance.main(
        [
            "--synthetic", "--backend", "oracle", "-m", model_dir,
            "--iterations", "40", "--init_iterations", "120",
        ]
    )
    key = "ours_40"
    assert key in results
    assert results[key]["PSNR"] is not None
    assert os.path.exists(os.path.join(model_dir, "results.json"))
