"""Pallas TPU kernels for the hot rendering path."""
