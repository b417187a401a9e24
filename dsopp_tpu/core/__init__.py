"""Core math: Lie groups, camera models, reprojection, patterns, sampling."""

from dsopp_tpu.core.lie import SE3, SO3  # noqa: F401
