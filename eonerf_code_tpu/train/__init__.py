"""Training entry points."""

from eonerf_code_tpu.train.loop import Trainer, train

__all__ = ["Trainer", "train"]
