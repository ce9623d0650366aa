"""Metric logging: TensorBoard events (same scalar names as the reference's
SummaryWriter usage, train_eonerf.py:166-171,286-294) plus a plain JSONL
mirror that tests and headless runs can read back without TB."""

import json
import os
import time


class MetricsLogger:
    def __init__(self, log_dir, use_tensorboard=True):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        # line-buffered: the jsonl doubles as a liveness signal (the stall
        # supervisor watches its growth), so block buffering would look
        # like a 10-15 min stall between 8 KB flushes
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a",
                           buffering=1)
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._tb = None

    def scalar(self, tag, value, step):
        v = float(value)
        self._jsonl.write(json.dumps({"t": time.time(), "tag": tag, "value": v, "step": int(step)}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, v, int(step))

    def scalars(self, d, step, prefix=""):
        for k, v in d.items():
            self.scalar(prefix + k, v, step)

    def image(self, tag, img_hwc, step):
        if self._tb is not None:
            import numpy as np

            img = np.asarray(img_hwc)
            if img.ndim == 2:
                img = img[:, :, None]
            self._tb.add_image(tag, img.transpose(2, 0, 1), int(step))

    def image_panel(self, tag, images, step):
        """Log a horizontal panel of same-height images (the reference's
        gt/pred/albedo/shadows/depth strips, utils.py:128-144)."""
        import numpy as np

        imgs = []
        for im in images:
            a = np.asarray(im, np.float32)
            if a.ndim == 2:
                a = a[:, :, None]
            if a.shape[2] == 1:
                a = np.repeat(a, 3, axis=2)
            imgs.append(np.clip(a, 0, 1))
        h = min(a.shape[0] for a in imgs)
        panel = np.concatenate([a[:h] for a in imgs], axis=1)
        self.image(tag, panel, step)

    def flush(self):
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
