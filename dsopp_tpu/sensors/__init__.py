"""Sensors: camera providers, calibration, photometric correction, masks."""

from dsopp_tpu.sensors.providers import (  # noqa: F401
    CameraDataFrame,
    ImageFolderProvider,
    ImageVideoProvider,
    NpyFolderProvider,
)
from dsopp_tpu.sensors.calibration import (  # noqa: F401
    CameraCalibration,
    load_calibration,
    load_photometric_calibration,
    load_vignetting,
)
from dsopp_tpu.sensors.camera import Camera, CameraSettings  # noqa: F401
