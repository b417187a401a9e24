"""Track state: live odometry track, frames, landmarks, export."""

from dsopp_tpu.track.state import AttachedFrame, MarginalizedKeyframe, OdometryTrack  # noqa: F401
