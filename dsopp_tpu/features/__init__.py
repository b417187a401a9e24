"""Image features: pyramids, gradients, candidate-point extraction."""

from dsopp_tpu.features.pyramid import build_pyramid, build_pyramid_maps  # noqa: F401
from dsopp_tpu.features.extractor import select_candidates  # noqa: F401
