#!/usr/bin/env python
"""Evaluation entry point — API mirror of the reference's eval_eonerf.py.

    python eval_eonerf.py <run_id> --logs_dir logs --output_dir out --dsm
"""

from eonerf_code_tpu.cli import eval_cli

if __name__ == "__main__":
    eval_cli()
