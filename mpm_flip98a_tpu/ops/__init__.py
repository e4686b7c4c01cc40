"""Compute ops: transfer stencils, small-matrix math, grid updates, binning,
and Pallas TPU kernels."""
