"""Feature-based bootstrap SLAM (monocular initializer)."""

from dsopp_tpu.fbs.initializer import MonocularInitializer, InitializerOptions  # noqa: F401
