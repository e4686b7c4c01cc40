"""Pallas TPU kernels for the transfer hot loops."""
