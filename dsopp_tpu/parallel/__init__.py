"""Multi-device scaling: mesh setup, landmark-sharded BA, sequence batching."""

from dsopp_tpu.parallel.mesh import make_mesh  # noqa: F401
