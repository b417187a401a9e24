

def test_crop_transformer_power_of_two(tmp_path):
    """ImageCropper parity: frames and model size crop to multiples of 2^4
    (camera_image_crop.hpp:15-21; transformers fabric.cpp appends the
    cropper unconditionally)."""
    import numpy as np
    from dsopp_tpu.sensors.camera import Camera, CameraSettings, crop_size_power_of_2
    from dsopp_tpu.sensors.calibration import CameraCalibration
    from dsopp_tpu.sensors.providers import CameraDataFrame

    assert crop_size_power_of_2(330, 250) == (320, 240)
    assert crop_size_power_of_2(320, 240) == (320, 240)

    class OneFrame:
        def __init__(self):
            self.done = False

        def next_frame(self):
            if self.done:
                return None
            self.done = True
            return CameraDataFrame(0, 0.0, np.random.rand(250, 330).astype(
                np.float32) * 255, 1.0)

    calib = CameraCalibration("pinhole", (330, 250),
                              np.asarray([300.0, 300.0, 165.0, 125.0]))
    cam = Camera("cam", OneFrame(), CameraSettings(
        calibration=calib, inverse_response=np.arange(256, dtype=np.float64)))
    frame = cam.next_frame()
    assert frame.image.shape == (240, 320)
    model = cam.camera_model()
    assert tuple(np.asarray(model.image_size).astype(int)) == (320, 240)
