#!/usr/bin/env python
"""Multi-AOI scene-parallel training entry point.

The reference trains one AOI per process; this framework trains S
independent AOI scenes in ONE jit program over a ("scene", "data") device
mesh (BASELINE.json configs[4] pod-scale mode). Each scene lands in its
own run directory compatible with eval_eonerf.py.

    python train_multi_aoi.py --root_dirs A,B --img_dirs iA,iB \
        --logs_dir logs --exp_name pod0 --scene_axis 2 --data_axis 4
"""

from eonerf_code_tpu.train.multi import main_multi_train

if __name__ == "__main__":
    main_multi_train()
