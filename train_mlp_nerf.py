#!/usr/bin/env python
"""Vanilla-NeRF training entry on nerf_synthetic scenes.

CLI mirror of the reference's `train_mlp_nerf.py` (which is broken as
shipped: it imports `utils2.render_image_with_occgrid`, a module that does
not exist — reference train_mlp_nerf.py:17). Same flag surface
(train_mlp_nerf.py:32-76) wired to the working occupancy-grid vanilla-NeRF
path (eonerf_code_tpu/train/train_vanilla.py); reports test-set PSNR at the
end like the reference's final evaluation loop (:206-231).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", type=str, default="data/nerf_synthetic",
                        help="the root dir of the dataset")
    parser.add_argument("--train_split", type=str, default="trainval",
                        choices=["train", "trainval"],
                        help="which train split to use")
    parser.add_argument("--scene", type=str, default="lego",
                        help="which scene to use")
    parser.add_argument("--test_chunk_size", type=int, default=1024)
    parser.add_argument("--cone_angle", type=float, default=0.0)
    parser.add_argument("--logs_dir", type=str, default="logs",
                        help="output directory to save experiment logs")
    parser.add_argument("--exp_name", type=str, default=None,
                        help="experiment name")
    parser.add_argument("--model", type=str, default="nerf",
                        choices=["nerf", "s-nerf", "sat-nerf", "eo-nerf"],
                        help="kept for flag parity; this entry always trains "
                             "the vanilla NeRF (as the reference does)")
    # knobs the reference hardcodes (train_mlp_nerf.py:85-99)
    parser.add_argument("--max_steps", type=int, default=50000)
    parser.add_argument("--batch_size", type=int, default=4096)
    parser.add_argument("--lr", type=float, default=5e-4)
    parser.add_argument("--net_depth", type=int, default=8)
    parser.add_argument("--net_width", type=int, default=256)
    parser.add_argument("--n_samples", type=int, default=129)
    parser.add_argument("--grid_resolution", type=int, default=64)
    parser.add_argument("--n_test_images", type=int, default=None)
    args = parser.parse_args(argv)

    from eonerf_code_tpu.train.train_vanilla import eval_psnr, train_vanilla

    result = train_vanilla(
        subject_id=args.scene, root_fp=args.data_root, logs_dir=args.logs_dir,
        max_steps=args.max_steps, batch_size=args.batch_size, lr=args.lr,
        net_depth=args.net_depth, net_width=args.net_width,
        n_samples=args.n_samples, grid_resolution=args.grid_resolution,
        train_split=args.train_split)
    psnr = eval_psnr(result, split="test", root_fp=args.data_root,
                     subject_id=args.scene, n_images=args.n_test_images,
                     chunk=args.test_chunk_size)
    print(f"test PSNR: {psnr:.2f} dB "
          f"({result['elapsed_s']:.0f}s, {args.max_steps} steps)")
    return psnr


if __name__ == "__main__":
    main()
