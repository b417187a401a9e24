"""Tracker layer: per-frame orchestration, depth estimation, activation, policies."""
