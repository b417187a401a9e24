"""Ground-truth synthetic fixtures for tests and benchmarks."""

from dsopp_tpu.testing.synthetic import SyntheticSequence, render_sequence  # noqa: F401
