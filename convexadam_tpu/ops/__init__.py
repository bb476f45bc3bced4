"""Pallas TPU kernels for the hot ops (with XLA fallbacks in core/)."""
