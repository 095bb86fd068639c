"""Data-layer tests: COLMAP parser round-trips, PLY round-trips, reader
split logic on generated fixtures (SURVEY.md section 4 item 5)."""

import os

import numpy as np
import pytest

from scgaussian_tpu.data import colmap, ply
from scgaussian_tpu.data.readers import read_colmap_scene
from scgaussian_tpu.data.scene import Scene, select_scene_reader
from scgaussian_tpu.data.synthetic import generate_scene


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synthscene")
    generate_scene(str(d), n_views=10, n_gaussians=40, n_points=80, width=64, height=48)
    return str(d)


def test_colmap_binary_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    cams = {
        1: colmap.ColmapCamera(1, "PINHOLE", 640, 480, np.array([500.0, 500.0, 320.0, 240.0])),
        2: colmap.ColmapCamera(2, "SIMPLE_PINHOLE", 320, 240, np.array([250.0, 160.0, 120.0])),
    }
    colmap.write_intrinsics_binary(str(tmp_path / "cameras.bin"), cams)
    back = colmap.read_intrinsics_binary(str(tmp_path / "cameras.bin"))
    assert back.keys() == cams.keys()
    for k in cams:
        assert back[k].model == cams[k].model
        np.testing.assert_allclose(back[k].params, cams[k].params)

    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    ims = {
        5: colmap.ColmapImage(
            5, q, np.array([0.1, 0.2, 0.3]), 1, "photo.png",
            rng.uniform(0, 100, (7, 2)), np.arange(7, dtype=np.int64),
        )
    }
    colmap.write_extrinsics_binary(str(tmp_path / "images.bin"), ims)
    back = colmap.read_extrinsics_binary(str(tmp_path / "images.bin"))
    assert back[5].name == "photo.png"
    np.testing.assert_allclose(back[5].qvec, q)
    np.testing.assert_allclose(back[5].xys, ims[5].xys)
    np.testing.assert_array_equal(back[5].point3D_ids, ims[5].point3D_ids)

    xyz = rng.normal(size=(11, 3))
    rgb = rng.integers(0, 255, (11, 3))
    err = rng.uniform(size=11)
    colmap.write_points3D_binary(str(tmp_path / "points3D.bin"), xyz, rgb, err)
    x2, r2, e2, pid = colmap.read_points3D_binary_pointid(str(tmp_path / "points3D.bin"))
    np.testing.assert_allclose(x2, xyz)
    np.testing.assert_allclose(r2, rgb)
    assert pid[1] == 0 and pid[11] == 10


def test_qvec_rotmat_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(10):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = colmap.qvec2rotmat(q)
        q2 = colmap.rotmat2qvec(R)
        np.testing.assert_allclose(q2, q, atol=1e-6)


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    props = {
        "x": rng.normal(size=20).astype(np.float32),
        "y": rng.normal(size=20).astype(np.float32),
        "opacity": rng.normal(size=20).astype(np.float32),
        "red": rng.integers(0, 255, 20).astype(np.uint8),
    }
    p = str(tmp_path / "t.ply")
    ply.write_ply(p, props)
    back = ply.read_ply(p)
    for k in props:
        np.testing.assert_array_equal(back[k], props[k])


def test_colmap_scene_reader_split(scene_dir):
    info = read_colmap_scene(scene_dir, "images", eval=True)
    # LLFF split: 10 views -> test idx {0, 8}, train = linspace-3 of the other 8
    assert len(info.test_cameras) == 2
    assert len(info.train_cameras) == 3
    names = [c.image_name for c in info.test_cameras]
    assert names == ["img_000", "img_008"]
    # train = idx 1..7,9 minus hold-out -> linspace over 8 -> positions 0, 3.5->4, 7
    train_names = [c.image_name for c in info.train_cameras]
    assert train_names == ["img_001", "img_005", "img_009"]
    # near/far computed and sane
    for c in info.train_cameras:
        assert c.near_far is not None and c.near_far[0] > 0 and c.near_far[1] > c.near_far[0]
    # match data present for all ordered train pairs
    for a in train_names:
        for b in train_names:
            if a != b:
                assert info.match_data[a][b].shape[1] == 2


def test_scene_orchestration(scene_dir, tmp_path):
    assert select_scene_reader(scene_dir) == "Colmap"
    scene = Scene(
        source_path=scene_dir,
        model_path=str(tmp_path / "model"),
        resolution=1,
        eval=True,
        shuffle=True,
        seed=0,
    )
    assert len(scene.train_cameras) == 3
    assert scene.bundle is not None
    assert scene.bundle.num_pairs == 6
    assert os.path.exists(tmp_path / "model" / "cameras.json")
    # view ids map shuffled cameras back to bundle indices
    ids = sorted(scene.view_id(c) for c in scene.train_cameras)
    assert ids == [0, 1, 2]
    # images loaded at full res (resolution=1)
    assert scene.train_cameras[0].image.shape == (3, 48, 64)


def test_blender_reader(tmp_path):
    """Blender transforms format: alpha compositing, 8-view split, masks."""
    import json
    from PIL import Image as PILImage
    from scgaussian_tpu.data.readers import read_blender_scene

    d = tmp_path / "blenderscene"
    (d / "train").mkdir(parents=True)
    (d / "test").mkdir()
    rng = np.random.default_rng(0)

    def make_frames(split, n):
        frames = []
        for i in range(n):
            img = (rng.uniform(0, 255, (32, 32, 4))).astype(np.uint8)
            img[:10, :, 3] = 0  # transparent band
            PILImage.fromarray(img, "RGBA").save(d / split / f"r_{i}.png")
            c2w = np.eye(4)
            c2w[2, 3] = 3.0 + 0.1 * i
            frames.append({"file_path": f"./{split}/r_{i}", "transform_matrix": c2w.tolist()})
        return frames

    for split, n in (("train", 100), ("test", 16)):
        with open(d / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.8, "frames": make_frames(split, n)}, f)
    # match data for the 8 fixed train views
    names = [f"r_{i}" for i in [2, 16, 26, 55, 73, 76, 86, 93]]
    md = {a: {b: rng.uniform(0.1, 0.9, (20, 2)).astype(np.float32) for b in names if b != a} for a in names}
    np.save(d / "match_data.npy", md, allow_pickle=True)

    info = read_blender_scene(str(d), white_background=True, eval=True)
    assert [c.image_name for c in info.train_cameras] == names
    assert len(info.test_cameras) == 16
    c = info.train_cameras[0]
    assert c.blendermask is not None and c.blendermask.shape == (32, 32)
    assert not c.blendermask[:10].any()  # transparent band -> mask False
    # white background composited where alpha=0
    arr = np.array(c.image)
    assert (arr[:10] > 250).all()
    np.testing.assert_allclose(c.near_far, [1.0, 6.0])
    assert info.match_data[names[0]][names[1]].shape == (20, 2)


def test_dtu_reader_and_dispatch(tmp_path):
    """DTU: 49 views, fixed train indices [25, 22, 28], idr masks, dtu path
    dispatch + is_dtu flag."""
    from PIL import Image as PILImage
    from scgaussian_tpu.data.readers import read_dtu_scene
    from scgaussian_tpu.data.scene import Scene, select_scene_reader

    d = tmp_path / "dtu_scan1"
    generate_scene(str(d), n_views=49, n_gaussians=10, n_points=40, width=32,
                   height=24, name_fmt="rect_{:03d}")
    # idr object masks: images/../idrmask/{idx-1:03d}.png
    (d / "idrmask").mkdir()
    rng = np.random.default_rng(0)
    for i in range(49):
        m = np.zeros((24, 32, 3), np.uint8)
        m[4:20, 6:28] = 255
        PILImage.fromarray(m).save(d / "idrmask" / f"{i:03d}.png")
    # match_data for the fixed train views (rect_NNN with N = idx, mask N-1)
    all_sorted = sorted(f"rect_{i:03d}" for i in range(49))
    names = sorted(all_sorted[i] for i in (25, 22, 28))
    md = {
        a: {b: rng.uniform(0.1, 0.9, (15, 2)).astype(np.float32) for b in names if b != a}
        for a in names
    }
    np.save(d / "match_data.npy", md, allow_pickle=True)

    info = read_dtu_scene(str(d), "images", eval=True)
    assert len(info.train_cameras) == 3
    expect = {all_sorted[i] for i in (25, 22, 28)}
    assert {c.image_name for c in info.train_cameras} == expect
    c = info.train_cameras[0]
    assert c.dtumask is not None and c.dtumask.shape == (24, 32)
    assert c.dtumask.max() == 1.0 and c.dtumask.min() == 0.0
    exclude = {3, 4, 5, 6, 7, 16, 17, 18, 19, 20, 21, 36, 37, 38, 39}
    assert len(info.test_cameras) == 49 - 3 - len(exclude) - 6  # minus rest of train_idx list

    assert select_scene_reader(str(d)) == "DTU"
