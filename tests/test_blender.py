"""Blender/vanilla-NeRF path tests with a generated miniature
nerf_synthetic-format dataset (the environment ships no real one)."""

import json
import os

import numpy as np
import pytest


def make_mini_blender(root, subject="minicube", n_frames=3, size=24):
    """Tiny nerf_synthetic-format subject: cameras on a circle looking at the
    origin, images of a white blob on transparent background."""
    sub = os.path.join(root, subject)
    os.makedirs(sub, exist_ok=True)
    from PIL import Image

    frames = []
    for i in range(n_frames):
        theta = 2 * np.pi * i / n_frames
        # camera at radius 4 looking at origin, y-up (OpenGL)
        pos = np.array([4 * np.sin(theta), 0.0, 4 * np.cos(theta)])
        z = pos / np.linalg.norm(pos)          # camera forward is -z
        up = np.array([0.0, 1.0, 0.0])
        x = np.cross(up, z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, pos
        img = np.zeros((size, size, 4), np.uint8)
        yy, xx = np.mgrid[0:size, 0:size]
        r2 = (xx - size / 2) ** 2 + (yy - size / 2) ** 2
        blob = r2 < (size / 4) ** 2
        img[blob] = [240, 220, 200, 255]
        name = f"r_{i}"
        Image.fromarray(img).save(os.path.join(sub, name + ".png"))
        frames.append({"file_path": name, "transform_matrix": c2w.tolist()})
    meta = {"camera_angle_x": 0.7, "frames": frames}
    for split in ("train", "val", "test"):
        with open(os.path.join(sub, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)
    return root, subject


@pytest.fixture(scope="module")
def mini_blender(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("blender"))
    return make_mini_blender(root)


class TestBlenderDataset:
    def test_ray_geometry(self, mini_blender):
        from eonerf_code_tpu.data.nerf_synthetic import BlenderDataset

        root, subject = mini_blender
        ds = BlenderDataset(subject, root, split="train")
        s = ds.full_image(0)
        h, w = s["h"], s["w"]
        # center pixel ray points from the camera toward the origin
        c = (h // 2) * w + (w // 2)
        o, d = s["rays_o"][c], s["rays_d"][c]
        to_origin = -o / np.linalg.norm(o)
        assert np.dot(d, to_origin) > 0.99
        np.testing.assert_allclose(np.linalg.norm(s["rays_d"], axis=1), 1.0, atol=1e-5)

    def test_background_compositing(self, mini_blender):
        from eonerf_code_tpu.data.nerf_synthetic import BlenderDataset

        root, subject = mini_blender
        ds = BlenderDataset(subject, root, split="train", num_rays=64, color_bkgd_aug="white")
        b = ds.sample_batch()
        assert b["pixels"].shape == (64, 3)
        # transparent pixels composite to white
        assert b["pixels"].max() <= 1.0


class TestVanillaTraining:
    def test_short_training_runs(self, mini_blender, tmp_path):
        from eonerf_code_tpu.train.train_vanilla import train_vanilla

        root, subject = mini_blender
        res = train_vanilla(subject_id=subject, root_fp=root, logs_dir=str(tmp_path),
                            max_steps=10, batch_size=128, n_samples=17,
                            grid_resolution=16, occ_every=4, log_every=5,
                            net_depth=2, net_width=32)
        leaves = [np.asarray(x) for x in
                  __import__("jax").tree_util.tree_leaves(res["params"])]
        assert all(np.isfinite(a).all() for a in leaves)

    def test_eval_runs(self, mini_blender, tmp_path):
        from eonerf_code_tpu.train.train_vanilla import eval_psnr, train_vanilla

        root, subject = mini_blender
        res = train_vanilla(subject_id=subject, root_fp=root, logs_dir=str(tmp_path),
                            max_steps=5, batch_size=64, n_samples=17,
                            grid_resolution=16, net_depth=2, net_width=32)
        p = eval_psnr(res, split="test", root_fp=root, subject_id=subject, n_images=1)
        assert np.isfinite(p)


class TestRootCLI:
    def test_train_mlp_nerf_cli_psnr(self, mini_blender, tmp_path):
        """The user-facing entry (root train_mlp_nerf.py — the reference
        ships it broken) trains and reports a REAL test PSNR."""
        import train_mlp_nerf

        root, subject = mini_blender
        psnr = train_mlp_nerf.main([
            "--data_root", root, "--scene", subject, "--train_split", "train",
            "--logs_dir", str(tmp_path), "--max_steps", "300",
            "--batch_size", "256", "--net_depth", "2", "--net_width", "32",
            "--n_samples", "17", "--grid_resolution", "16",
            "--n_test_images", "1", "--test_chunk_size", "512"])
        # the mini subject is a flat white blob; 300 steps must fit it well
        assert psnr > 18.0
