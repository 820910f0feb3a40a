"""Compute kernels: geometry, binning, rasterization, shading, post."""
