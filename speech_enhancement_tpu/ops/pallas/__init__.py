"""Pallas TPU kernels for hot ops (CPU tests run in interpret mode)."""
