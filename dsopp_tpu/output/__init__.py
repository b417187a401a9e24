"""Output: trajectory export, track serialization, evaluation."""

from dsopp_tpu.output.tum import export_tum, load_tum  # noqa: F401
from dsopp_tpu.output.ate import absolute_trajectory_error, align_trajectories  # noqa: F401
