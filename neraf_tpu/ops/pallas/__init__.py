"""Pallas TPU kernels for hot ops."""
