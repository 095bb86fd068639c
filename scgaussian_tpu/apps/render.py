"""Render CLI — train/test set rendering with depth + error-map outputs.

Mirrors `render.py:119-195`: writes `<model>/{train,test}/ours_<it>/
{renders,gt,depth,error_map,dtumask}` PNGs, min-max-normalized depth plus a
turbo-colormapped depth, the 0.5*L1+0.5*SSIM error map, and the colored
point cloud on the first train view. Loads the model from the saved PLY
(`scene/__init__.py:91-95`)."""

from __future__ import annotations

import json
import os
from argparse import ArgumentParser

import numpy as np
from PIL import Image


def save_image(arr: np.ndarray, path: str) -> None:
    """[C, H, W] or [H, W] float in [0, 1] -> PNG."""
    if arr.ndim == 3:
        arr = arr.transpose(1, 2, 0)
        if arr.shape[-1] == 1:
            arr = arr[..., 0]
    Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8)).save(path)


def save_turbo_depth(depth: np.ndarray, path: str) -> None:
    """Turbo-colormapped depth (`render.py:97-110`): vmax at the 98th
    percentile."""
    import matplotlib as mpl
    import matplotlib.cm as cm

    vmax = np.percentile(depth, 98)
    normalizer = mpl.colors.Normalize(vmin=depth.min(), vmax=vmax)
    mapper = cm.ScalarMappable(norm=normalizer, cmap="turbo")
    Image.fromarray(
        (mapper.to_rgba(depth)[:, :, :3] * 255).astype(np.uint8)
    ).save(path)


def render_set(model_path, name, iteration, cameras, model, bg_color, backend="tpu",
               save_color_pcd=False):
    import jax.numpy as jnp

    import jax

    from scgaussian_tpu.data.ply import store_point_cloud
    from scgaussian_tpu.losses import pixel_loss_map as _pixel_loss_eager
    from scgaussian_tpu.renderer.project import sh_to_color
    from scgaussian_tpu.train.main_stage import render_model_jit as render_model

    # jitted: eager per-primitive dispatch of the avgpool-SSIM error map is
    # pathological on remote-dispatch TPU backends (see eval/metrics.py)
    pixel_loss_map = jax.jit(_pixel_loss_eager)

    base = os.path.join(model_path, name, f"ours_{iteration}")
    dirs = {k: os.path.join(base, k) for k in ("renders", "gt", "depth", "error_map", "dtumask")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    for idx, cam in enumerate(cameras):
        out = render_model(cam.camera, model, jnp.asarray(bg_color), backend=backend)
        # outside the training pipeline there is no regrow guard, so a
        # truncated render must be loud (ADVICE round-3 #3): the default
        # entry budget is sized for training-scale coverage and can clip
        # dense scenes rendered directly.
        ovf = int(out.overflow)
        if ovf > 0:
            print(
                f"WARNING: view {idx}: rasterizer dropped {ovf} tile entries "
                f"(entry budget too small) — the image is truncated; re-run "
                f"with a larger RasterizerConfig.entry_budget"
            )
        rendering = np.asarray(jnp.clip(out.render, 0, 1))
        depth = np.asarray(out.rendered_depth)[0]
        rng = depth.max() - depth.min()
        depth_norm = (depth - depth.min()) / (rng if rng > 0 else 1.0)

        if name == "train" and idx == 0 and save_color_pcd:
            # colored point cloud (`gaussian_renderer/__init__.py:90-96`)
            xyz = np.asarray(model.get_xyz())
            alive = np.asarray(model.alive_mask())
            colors = np.asarray(
                sh_to_color(
                    model.get_features(), model.get_xyz(), cam.camera.cam_center,
                    model.max_sh_degree,
                )
            )
            store_point_cloud(
                os.path.join(model_path, name, "point_cloud_color.ply"),
                xyz[alive],
                np.clip(colors[alive], 0, 1) * 255,
            )

        save_image(rendering, os.path.join(dirs["renders"], f"{idx:05d}.png"))
        if cam.image is not None:
            gt = np.clip(cam.image, 0, 1)
            save_image(gt, os.path.join(dirs["gt"], f"{idx:05d}.png"))
            err = np.asarray(pixel_loss_map(jnp.asarray(rendering), jnp.asarray(gt)))
            save_image(err, os.path.join(dirs["error_map"], f"{idx:05d}.png"))
        save_image(depth_norm, os.path.join(dirs["depth"], f"{idx:05d}.png"))
        if cam.dtumask is not None:
            save_image(cam.dtumask, os.path.join(dirs["dtumask"], f"{idx:05d}.png"))
        save_turbo_depth(depth_norm, os.path.join(dirs["depth"], f"color_{idx:05d}.png"))


def main(argv=None):
    from scgaussian_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from scgaussian_tpu.data.scene import Scene
    from scgaussian_tpu.model import io as model_io

    parser = ArgumentParser(description="Testing script parameters")
    parser.add_argument("--source_path", "-s", type=str, default=None)
    parser.add_argument("--model_path", "-m", type=str, required=True)
    parser.add_argument("--images", "-i", type=str, default=None)
    parser.add_argument("--resolution", "-r", type=int, default=None)
    parser.add_argument("--white_background", "-w", action="store_true", default=None)
    parser.add_argument("--eval", action="store_true", default=None)
    parser.add_argument("--sh_degree", type=int, default=None)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--backend", type=str, default="tpu")
    parser.add_argument("--bg_capacity", type=int, default=65536)
    args = parser.parse_args(argv)

    # cfg_args.json overlay (reference get_combined_args, arguments/__init__.py:93-113)
    cfg_path = os.path.join(args.model_path, "cfg_args.json")
    cfg = {}
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cfg = json.load(f)
    for key in ("source_path", "images", "resolution", "white_background", "eval", "sh_degree"):
        if getattr(args, key) is None and key in cfg:
            setattr(args, key, cfg[key])
    print("Rendering " + args.model_path)

    scene = Scene(
        source_path=args.source_path,
        model_path=args.model_path,
        images=args.images or "images",
        resolution=args.resolution if args.resolution is not None else -1,
        white_background=bool(args.white_background),
        eval=bool(args.eval),
        shuffle=False,
        load_iteration=args.iteration,
    )
    model = model_io.load_ply(
        os.path.join(scene.point_cloud_dir(scene.loaded_iter), "point_cloud.ply"),
        max_sh_degree=args.sh_degree or 3,
        bg_capacity=args.bg_capacity,
    )
    bg = [1.0, 1.0, 1.0] if args.white_background else [0.0, 0.0, 0.0]

    if not args.skip_train:
        render_set(args.model_path, "train", scene.loaded_iter, scene.train_cameras,
                   model, bg, args.backend, save_color_pcd=True)
    if not args.skip_test:
        render_set(args.model_path, "test", scene.loaded_iter, scene.test_cameras,
                   model, bg, args.backend)


if __name__ == "__main__":
    main()
