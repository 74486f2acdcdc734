"""Pallas TPU kernels for the performance-critical ops."""
