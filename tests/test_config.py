import json

import numpy as np

from sixdof_tpu.config import IcpConfig, PipelineConfig
from sixdof_tpu.utils.logging_utils import make_yaml_dumpable, rle_to_mask


def test_icp_config_roundtrip(tmp_path):
    raw = {
        "debug_vis": False,
        "box": True,
        "mesh": False,
        "voxel_size": 3.0,
        "preprocess_target": {"max_pcd": 5000, "fpfh_radius": 25, "fpfh_max_nn": 80},
        "preprocess_source": {
            "down_sample": 3.0,
            "plane_removal": {"distance_threshold": 1.5, "num_iterations": 200},
            "fpfh_radius": 25,
            "fpfh_max_nn": 80,
        },
        "execute_global_registration": {
            "distance_threshold": 12.0,
            "correspondence_checkers": [{"value": 0.85}],
            "angle_threshold": 0.5,
            "ransac_criteria": {"iterations": 1000, "confidence": 0.99},
        },
        "refine_registration": {"distance_threshold": 6.0},
        "run_icp": {"fitness_threshold": 0.85, "rmse_threshold": 2.5},
    }
    p = tmp_path / "icp_parameters.json"
    p.write_text(json.dumps(raw))
    cfg = IcpConfig.from_json(str(p))
    assert cfg.preprocess_target.max_pcd == 5000
    assert cfg.preprocess_source.plane_removal.num_iterations == 200
    assert cfg.refine_distance_threshold == 6.0
    back = cfg.to_reference_dict()
    assert back["preprocess_target"]["max_pcd"] == 5000
    assert back["execute_global_registration"]["correspondence_checkers"][0]["value"] == 0.85
    assert back["run_icp"]["fitness_threshold"] == 0.85
    # defaults fill absent budget knobs
    assert back["run_icp"]["n_restarts"] == 50


def test_cli_overrides():
    cfg = IcpConfig()

    class Args:
        debug = 3
        box = False
        mesh = True
        voxel_size = 7.5

    cfg.apply_cli_overrides(Args())
    assert cfg.debug_vis is True
    assert cfg.box is False and cfg.mesh is True and cfg.voxel_size == 7.5


def test_pipeline_config_defaults():
    p = PipelineConfig()
    assert p.est_refine_iter == 5 and p.track_refine_iter == 2
    assert p.heatmap_threshold == 0.75


def test_rle_to_mask():
    # 3x2 mask: counts over column-major order
    rle = {"size": [3, 2], "counts": [2, 3, 1]}
    mask = rle_to_mask(rle)
    assert mask.shape == (3, 2)
    assert mask.sum() == 3


def test_make_yaml_dumpable():
    d = {"a": np.float32(1.5), "b": np.arange(3), "c": {"d": np.int64(2)}, "e": [np.float64(0.5)]}
    out = make_yaml_dumpable(d)
    import yaml

    s = yaml.safe_dump(out)
    assert "1.5" in s and "2" in s


def test_reader_routes_through_typed_config():
    """readers.update_config must produce the pipeline dict via IcpConfig
    (CLI > JSON > defaults) and keep the typed tree on the reader."""
    import os

    from sixdof_tpu.io.readers import DataReader

    scene = os.path.join(os.path.dirname(__file__), "..", "demo_data", "synth_box")
    if not os.path.isdir(scene):
        import pytest

        pytest.skip("demo scene absent")

    class Args:
        debug = 0
        box = None
        mesh = None
        voxel_size = 9.25  # CLI override beats the scene JSON's 2.0

    reader = DataReader(base_dir=scene, arguments=Args())
    assert reader.parameters["voxel_size"] == 9.25
    assert reader.icp_config.voxel_size == 9.25
    # JSON beats dataclass defaults
    assert reader.parameters["preprocess_target"]["max_pcd"] == 3000
    # dataclass defaults fill keys the JSON omits
    assert reader.parameters["preprocess_source"]["mesh"]["number_of_points"] == 3000


def test_mesh_smoothing_config_roundtrip():
    raw = {"preprocess_source": {"mesh": {"radius": 3.0, "number_of_iterations": 4,
                                          "number_of_points": 500}}}
    cfg = IcpConfig.from_dict(raw)
    assert cfg.preprocess_source.mesh.radius == 3.0
    back = cfg.to_reference_dict()
    assert back["preprocess_source"]["mesh"]["number_of_points"] == 500
