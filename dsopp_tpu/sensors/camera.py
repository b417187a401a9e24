"""Camera sensor: provider → photometric correction → undistortion → frames.

Mirrors the reference ``Camera`` sensor per-frame pipeline
(reference: src/sensors/camera/src/camera.cpp:26-77 — provider → undistort →
transformers → CameraFeatures with lazy pyramid/features; mask pyramid
ownership) and ``CameraSettings`` (camera_settings.hpp:19-99).

Differences: pyramids/features are built by the tracker's jitted tick (no
lazy CPU extraction), so the sensor only produces corrected, undistorted
float images + metadata.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

import jax.numpy as jnp

from dsopp_tpu.sensors.calibration import (
    CameraCalibration,
    load_calibration,
    load_photometric_calibration,
    load_vignetting,
)
from dsopp_tpu.sensors.masks import load_mask
from dsopp_tpu.sensors.photometric import correct_image
from dsopp_tpu.sensors.providers import CameraDataFrame, create_provider
from dsopp_tpu.sensors.undistorter import (
    Undistorter,
    build_remaps,
    identity_undistorter,
)


@dataclass
class CameraSettings:
    """Calibration bundle of one camera (camera_settings.hpp analog)."""

    calibration: CameraCalibration
    inverse_response: np.ndarray             # 256-entry G⁻¹
    vignetting: Optional[np.ndarray] = None  # [H, W] attenuation
    mask: Optional[object] = None            # [H, W] bool
    undistorter: Optional[Undistorter] = None

    @staticmethod
    def from_files(calib_path, pcalib_path=None, vignette_path=None,
                   mask_path=None, transform_to_pinhole=True,
                   shutter_time=0.0) -> "CameraSettings":
        calib = load_calibration(calib_path, shutter_time)
        und = None
        if calib.model_type != "pinhole" and transform_to_pinhole:
            src = calib.camera_model(0, jnp.float64)
            und = build_remaps(src)
            tgt = und.target_model
            calib = CameraCalibration(
                "pinhole", calib.image_size,
                np.asarray([float(tgt.fx), float(tgt.fy),
                            float(tgt.cx), float(tgt.cy)]),
                calib.shutter_time)
        mask = load_mask(mask_path, calib.image_size)
        return CameraSettings(
            calibration=calib,
            inverse_response=load_photometric_calibration(pcalib_path),
            vignetting=load_vignetting(vignette_path),
            mask=mask,
            undistorter=und,
        )


def crop_size_power_of_2(width: int, height: int, levels: int = 4):
    """Largest (w, h) ≤ input divisible by 2^levels (camera_image_crop.hpp:15-21,
    kNumberOfPyramidLevels=4 — eases pyramid construction)."""
    step = 1 << levels
    return (width >> levels) * step, (height >> levels) * step


@dataclass
class Camera:
    """Camera sensor: pulls provider frames through the correction chain."""

    sensor_id: str
    provider: object
    settings: CameraSettings
    resize_ratio: float = 1.0
    crop_levels: int = 4    # ImageCropper always runs (transformers fabric.cpp:29)
    semantics_folder: Optional[str] = None   # per-frame class-id images
    semantic_filter: tuple = ()              # class ids masked out (legend)

    _vignetting_dev: object = field(default=None, repr=False)

    @staticmethod
    def from_config(sensor_id: str, params: dict, base_dir: str = ".") -> "Camera":
        import os

        def p(key, sub):
            v = sub.get(key)
            return os.path.join(base_dir, v) if v else None

        provider_params = dict(params["provider"])
        for key in ("folder", "timestamps", "video_file"):
            if key in provider_params:
                provider_params[key] = os.path.join(base_dir, provider_params[key])
        provider = create_provider(provider_params)

        model_params = params.get("model", {})
        settings = CameraSettings.from_files(
            p("calibration", model_params),
            p("photometric_calibration", model_params),
            p("vignetting", model_params),
            p("camera_mask", params),
            shutter_time=float(model_params.get("shutter_time_seconds", 0.0)),
        )
        ratio = 1.0
        transforms = params.get("transformations", {})
        if "resize_transformer" in transforms:
            ratio = float(transforms["resize_transformer"].get("resize_ratio", 1.0))

        # per-frame semantics (reference: semantics data on CameraFeatures +
        # CameraMask::filterSemanticObjects; legend lists filtered classes)
        sem_params = params.get("semantics", {}) or {}
        sem_folder = sem_params.get("folder")
        if sem_folder:
            sem_folder = os.path.join(base_dir, sem_folder)
        sem_filter = tuple(sem_params.get("filter", ()))
        return Camera(sensor_id, provider, settings, ratio,
                      semantics_folder=sem_folder, semantic_filter=sem_filter)

    def camera_model(self, level: int = 0, dtype=jnp.float32):
        model = self.settings.calibration.camera_model(0, dtype)
        if self.resize_ratio != 1.0:
            model = model.scaled(1.0 / self.resize_ratio)
        if self.crop_levels:
            w = int(float(model.image_size[..., 0]))
            h = int(float(model.image_size[..., 1]))
            cw, ch = crop_size_power_of_2(w, h, self.crop_levels)
            if (cw, ch) != (w, h):
                model = model._replace(
                    image_size=jnp.asarray((cw, ch), model.image_size.dtype))
        return model.scaled(float(2 ** level)) if level else model

    def processed_mask(self):
        """The CameraMask transformed exactly like frames (resize + crop) —
        what candidate selection must consult (camera.cpp owns the mask
        pyramid; here the tracker applies it at selection time)."""
        mask = self.settings.mask
        if mask is None:
            return None
        m = np.asarray(mask).astype(np.uint8)
        if self.resize_ratio != 1.0:
            import cv2

            m = cv2.resize(m, None, fx=self.resize_ratio, fy=self.resize_ratio,
                           interpolation=cv2.INTER_NEAREST)
        if self.crop_levels:
            cw, ch = crop_size_power_of_2(m.shape[1], m.shape[0],
                                          self.crop_levels)
            m = m[:ch, :cw]
        return jnp.asarray(m > 0)

    def next_frame(self) -> Optional[CameraDataFrame]:
        frame = self.provider.next_frame()
        if frame is None:
            return None
        img = frame.image
        und = self.settings.undistorter
        if und is not None and not und.identity:
            img = und.undistort(img)
        if self.resize_ratio != 1.0:
            import cv2

            img = cv2.resize(
                img, None, fx=self.resize_ratio, fy=self.resize_ratio,
                interpolation=cv2.INTER_AREA)
        # crop transformer (ImageCropper): keep top-left region divisible by
        # 2^crop_levels; intrinsics are unchanged (calibration.crop() only
        # shrinks the valid image size)
        if self.crop_levels:
            cw, ch = crop_size_power_of_2(
                img.shape[1], img.shape[0], self.crop_levels)
            if (cw, ch) != (img.shape[1], img.shape[0]):
                img = img[:ch, :cw]
        vignetting = self.settings.vignetting
        if vignetting is not None and vignetting.shape != img.shape:
            import cv2

            vignetting = cv2.resize(
                vignetting, (img.shape[1], img.shape[0]),
                interpolation=cv2.INTER_AREA)
            self.settings.vignetting = vignetting
        # photometric correction: native C++ path when available (host-side
        # prep that overlaps device compute; dsopp_tpu/native), JAX fallback
        from dsopp_tpu import native

        if native.available() and isinstance(img, np.ndarray):
            corrected = jnp.asarray(native.photometric_correct(
                np.asarray(img, np.float32),
                np.asarray(self.settings.inverse_response, np.float32),
                None if vignetting is None
                else np.asarray(vignetting, np.float32)))
        else:
            corrected = correct_image(
                jnp.asarray(img),
                jnp.asarray(self.settings.inverse_response),
                None if vignetting is None
                else jnp.asarray(vignetting, jnp.float32),
            )
        semantics = self._load_semantics(frame.frame_id, corrected.shape)
        return CameraDataFrame(frame.frame_id, frame.timestamp,
                               corrected, frame.exposure,
                               semantics=semantics)

    def _load_semantics(self, frame_id, image_shape):
        """Class-id image for this frame, transformed like the image
        (NEAREST resize + crop); None when no semantics are configured."""
        if not self.semantics_folder:
            return None
        import os

        import cv2

        for ext in (".png", ".npy"):
            path = os.path.join(self.semantics_folder, f"{frame_id}{ext}")
            if os.path.exists(path):
                break
        else:
            return None
        if path.endswith(".npy"):
            sem = np.load(path)
        else:
            sem = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if sem is None:
            return None
        h, w = image_shape
        if sem.shape != (h, w):
            # same transform chain as frames: ratio resize (NEAREST keeps
            # ids), then the power-of-2 crop
            if self.resize_ratio != 1.0:
                sem = cv2.resize(sem, None, fx=self.resize_ratio,
                                 fy=self.resize_ratio,
                                 interpolation=cv2.INTER_NEAREST)
            sem = sem[:h, :w]
            if sem.shape != (h, w):  # provider-sized semantics: direct map
                sem = cv2.resize(sem, (w, h),
                                 interpolation=cv2.INTER_NEAREST)
        return np.asarray(sem)
