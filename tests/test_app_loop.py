"""End-to-end app-loop integration test (tiny settings, CPU)."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCENE = os.path.join(REPO, "demo_data", "synth_box")


@pytest.fixture(scope="module")
def scene_dir():
    if not os.path.exists(os.path.join(SCENE, "rgb", "rgb_0000.png")):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "make_demo_scene.py"), SCENE, "3"],
            check=True,
        )
    return SCENE


@pytest.mark.slow
def test_full_app_loop(scene_dir, tmp_path):
    from sixdof_tpu.app.run import build_parser, main

    args = build_parser().parse_args(
        [
            "--test_scene_dir", scene_dir, "--demo", "--debug", "1",
            "--debug_dir", str(tmp_path / "debug"),
            "--shorter_side", "120", "--max_frames", "3", "--no_server",
            "--est_refine_iter", "1", "--track_refine_iter", "1",
            "--capture_every", "2", "--max_hypotheses", "8",
        ]
    )
    frame_times = main(args)
    assert len(frame_times) == 3
    # pose logs written per frame
    for i in range(3):
        pose = np.loadtxt(tmp_path / "debug" / "ob_in_cam" / f"{i:04d}.txt")
        assert pose.shape == (4, 4)
        R = pose[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
    # track_vis written when debug>=1? (only at debug>=2) — overlay asset exists
    from sixdof_tpu.app.web_vis import ASSETS_DIR

    assert os.path.exists(os.path.join(ASSETS_DIR, "overlay.png"))


@pytest.mark.slow
def test_pipelined_tracking_matches_sync(scene_dir, tmp_path):
    """track_pipeline>0 defers host readback but must yield identical poses
    (the on-device pose chain is exactly the sync math), including when a
    capture frame forces a mid-pipeline sync."""
    from sixdof_tpu.app.run import build_parser, main

    base = [
        "--test_scene_dir", scene_dir, "--demo", "--debug", "0",
        "--shorter_side", "120", "--max_frames", "4", "--no_server",
        "--est_refine_iter", "1", "--track_refine_iter", "1",
        "--capture_every", "3", "--max_hypotheses", "8",
    ]
    args_sync = build_parser().parse_args(
        base + ["--debug_dir", str(tmp_path / "sync"), "--track_pipeline", "0"])
    main(args_sync)
    args_pipe = build_parser().parse_args(
        base + ["--debug_dir", str(tmp_path / "pipe"), "--track_pipeline", "2"])
    main(args_pipe)
    for i in range(4):
        ps = np.loadtxt(tmp_path / "sync" / "ob_in_cam" / f"{i:04d}.txt")
        pp = np.loadtxt(tmp_path / "pipe" / "ob_in_cam" / f"{i:04d}.txt")
        np.testing.assert_allclose(pp, ps, atol=1e-5)
