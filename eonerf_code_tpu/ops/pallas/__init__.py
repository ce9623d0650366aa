"""Pallas TPU kernels for the EO-NeRF hot path."""
