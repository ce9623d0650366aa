#!/usr/bin/env python
"""Training entry point — API mirror of the reference's train_eonerf.py.

    python train_eonerf.py --root_dir ... --img_dir ... --exp_name ... \
        --model eo-nerf --img_downscale 2 --max_train_steps 300000 \
        --geometric_shadows --radiometric_normalization --batch_size 1024
"""

from eonerf_code_tpu.cli import main_train

if __name__ == "__main__":
    main_train()
