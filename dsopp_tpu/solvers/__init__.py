"""Optimization layer: measures, linear systems, pose alignment, PBA, depth estimation."""
