"""Kinect toolkit exercised against a FAKE pykinect_azure SDK.

The reference's src/kinect.py is manual-hardware-only; here the whole
calibration/capture/campaign flow runs hermetically by injecting a mock SDK
module (the readers' offline/live polymorphism taken one level deeper)."""
import json
import os
import sys
import types

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from sixdof_tpu.io import kinect_tools as kt


class _FakeCapture:
    def __init__(self, fail_first=0):
        self._fails = fail_first

    def _ret(self):
        if self._fails > 0:
            self._fails -= 1
            return False
        return True

    def get_depth_image(self):
        ok = self._ret()
        return ok, (np.full((30, 40), 500, np.uint16) if ok else None)

    def get_color_image(self):
        return True, np.full((30, 40, 4), 128, np.uint8)

    def get_pointcloud(self):
        return True, np.random.RandomState(0).rand(100, 3) * 100


class _FakeDevice:
    def __init__(self):
        self.fail_first = 0
        self.stopped = False

    def update(self):
        c = _FakeCapture(self.fail_first)
        self.fail_first = 0
        return c

    def get_calibration(self, depth_mode, color_resolution):
        class P:
            fx, fy, cx, cy = 600.0, 600.0, 320.0, 240.0

        class E:
            rotation = list(np.eye(3).reshape(-1))
            translation = [1.0, -2.0, 3.0]

        class CC:
            extrinsics = E

        class C:
            color_params = P
            depth_params = P
            color_calibration = CC

        return C

    def stop_cameras(self):
        self.stopped = True

    def close(self):
        pass


@pytest.fixture
def fake_sdk(monkeypatch):
    mod = types.ModuleType("pykinect_azure")
    mod.initialize_libraries = lambda: None
    mod.default_configuration = types.SimpleNamespace(
        color_format=None, color_resolution=None, depth_mode=None
    )
    mod.K4A_IMAGE_FORMAT_COLOR_BGRA32 = "bgra32"
    mod.K4A_COLOR_RESOLUTION_720P = "720p"
    mod.K4A_DEPTH_MODE_NFOV_2X2BINNED = "nfov"
    dev = _FakeDevice()
    mod.start_device = lambda config: dev
    monkeypatch.setitem(sys.modules, "pykinect_azure", mod)
    monkeypatch.setattr(kt.time, "sleep", lambda s: None)
    return mod, dev


def test_initialize_and_calibration_dump(fake_sdk, tmp_path):
    mod, dev = fake_sdk
    device, config = kt.initialize_kinect()
    assert config.color_format == "bgra32" and config.depth_mode == "nfov"

    c2d, d2c = kt.get_extrinsics(device, config)
    np.testing.assert_allclose(c2d[:3, 3], [1.0, -2.0, 3.0])
    np.testing.assert_allclose(c2d @ d2c, np.eye(4), atol=1e-12)

    kt.dump_calibration(str(tmp_path))
    with open(tmp_path / "configs" / "camera_intrinsics.json") as f:
        intr = json.load(f)
    assert intr["color"]["fx"] == 600.0
    with open(tmp_path / "configs" / "camera_extrinsics.json") as f:
        extr = json.load(f)
    assert extr["color_to_depth"]["translation_vector"][0] == [1.0, -2.0, 3.0]
    assert dev.stopped


def test_capture_retry_and_save(fake_sdk, tmp_path):
    mod, dev = fake_sdk
    device, config = kt.initialize_kinect()
    dev.fail_first = 2  # reference's retry-until-success (src/kinect.py:232-237)
    color, depth, points = kt.capture_frame(device)
    assert color.shape == (30, 40, 4) and depth.dtype == np.uint16

    ok = kt.capture_save(device, str(tmp_path), frame_count=3)
    assert ok
    assert os.path.exists(tmp_path / "rgb" / "rgb_0003.png")
    assert os.path.exists(tmp_path / "depth" / "depth_0003.png")
    assert os.path.exists(tmp_path / "pcd" / "cloud_0003.ply")
    assert kt.get_last_frame_id(str(tmp_path)) == 3


def test_background_and_campaign(fake_sdk, tmp_path):
    mod, dev = fake_sdk
    device, config = kt.initialize_kinect()
    path = kt.capture_background(device, str(tmp_path), countdown=1)
    assert os.path.exists(path)

    kt.pvnet_data_capture(device, config, str(tmp_path), total_captures=3,
                          interval=0, dim_light_frame=2, dim_interval=0)
    assert kt.get_last_frame_id(str(tmp_path)) == 2  # frames 0..2
    # resume: next campaign continues from the last id
    kt.pvnet_data_capture(device, config, str(tmp_path), total_captures=2,
                          interval=0, dim_light_frame=10, dim_interval=0)
    assert kt.get_last_frame_id(str(tmp_path)) == 4
    with open(tmp_path / "info.json") as f:
        info = json.load(f)
    assert len(info) == 5 and all("K" in v for v in info.values())


def test_requires_sdk_without_fake(tmp_path):
    if "pykinect_azure" in sys.modules:
        del sys.modules["pykinect_azure"]
    with pytest.raises(RuntimeError, match="pykinect_azure"):
        kt.initialize_kinect()
