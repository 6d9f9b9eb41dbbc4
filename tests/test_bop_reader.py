"""BOP-format reader over a synthetic on-disk fixture (hermetic)."""
import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from sixdof_tpu.io.bop_reader import BopSceneReader


def _write_bop_scene(root):
    scene = os.path.join(root, "test", "000001")
    models = os.path.join(root, "models")
    for sub in ("rgb", "depth", "mask_visib", "mask"):
        os.makedirs(os.path.join(scene, sub), exist_ok=True)
    os.makedirs(models, exist_ok=True)

    H, W = 60, 80
    cam = {}
    gt = {}
    gt_info = {}
    for fid in (0, 1):
        rgb = np.full((H, W, 3), 40, dtype=np.uint8)
        rgb[10:30, 20:50] = [200, 50, 50]
        cv2.imwrite(f"{scene}/rgb/{fid:06d}.png", rgb[..., ::-1])
        depth = np.zeros((H, W), dtype=np.uint16)
        depth[10:30, 20:50] = 5000  # * 0.1 scale / 1000 = 0.5 m
        cv2.imwrite(f"{scene}/depth/{fid:06d}.png", depth)
        # two instances: ours (obj 7, idx 1) and another (obj 3, idx 0)
        m0 = np.zeros((H, W), dtype=np.uint8)
        m0[12:20, 22:30] = 255
        m1 = np.zeros((H, W), dtype=np.uint8)
        m1[10:30, 20:50] = 255
        m1_vis = m1.copy()
        m1_vis[12:20, 22:30] = 0  # occluded by instance 0
        cv2.imwrite(f"{scene}/mask_visib/{fid:06d}_000000.png", m0)
        cv2.imwrite(f"{scene}/mask_visib/{fid:06d}_000001.png", m1_vis)
        cv2.imwrite(f"{scene}/mask/{fid:06d}_000001.png", m1)
        cam[str(fid)] = {"cam_K": [300.0, 0, 40, 0, 300.0, 30, 0, 0, 1],
                         "depth_scale": 0.1}
        gt[str(fid)] = [
            {"obj_id": 3, "cam_R_m2c": list(np.eye(3).reshape(-1)),
             "cam_t_m2c": [0, 0, 450.0]},
            {"obj_id": 7, "cam_R_m2c": list(np.eye(3).reshape(-1)),
             "cam_t_m2c": [10.0, -5.0, 500.0]},
        ]
        gt_info[str(fid)] = [{"visib_fract": 1.0}, {"visib_fract": 0.8}]
    with open(f"{scene}/scene_camera.json", "w") as f:
        json.dump(cam, f)
    with open(f"{scene}/scene_gt.json", "w") as f:
        json.dump(gt, f)
    with open(f"{scene}/scene_gt_info.json", "w") as f:
        json.dump(gt_info, f)

    # a tiny mm-scale model ply for obj 7 + models_info
    from sixdof_tpu.io.mesh_io import TriMesh, save_mesh

    v = np.array([[0, 0, 0], [40.0, 0, 0], [0, 40.0, 0], [0, 0, 40.0]])
    fcs = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])
    save_mesh(f"{models}/obj_000007.ply", TriMesh(v, fcs))
    with open(f"{models}/models_info.json", "w") as f:
        json.dump({"7": {"diameter": 69.28,
                         "symmetries_discrete": [list(np.eye(4).reshape(-1))][0] and
                         [float(x) for x in np.eye(4).reshape(-1)]}}, f)
    return scene


def test_bop_reader_contract(tmp_path):
    scene = _write_bop_scene(str(tmp_path))
    r = BopSceneReader(scene, ob_id=7)
    assert len(r) == 2
    assert r.get_video_name() == "000001"

    K = r.get_K(0)
    assert K[0, 0] == 300.0 and K[0, 2] == 40.0

    color = r.get_color(0)
    assert color.shape == (60, 80, 3)
    assert color[15, 25, 0] == 200  # RGB order (red patch)

    depth = r.get_depth(0)
    assert abs(depth[15, 35] - 0.5) < 1e-6  # depth_scale honored
    assert depth[0, 0] == 0.0

    pose = r.get_gt_pose(0)
    np.testing.assert_allclose(pose[:3, 3], [0.01, -0.005, 0.5], atol=1e-9)

    mask = r.get_mask(0)
    assert mask[25, 40] and not mask[15, 25]  # visible part only

    occ = r.get_occ_mask(0)
    assert occ[15, 25] == 1  # other instance occludes our amodal region
    assert occ[25, 40] == 0

    assert r.get_visib_fract(0) == 0.8

    mesh = r.get_gt_mesh()
    assert mesh.vertices.max() <= 0.05  # mm -> m
    assert abs(r.get_model_diameter() - 0.06928) < 1e-6
    tfs = r.get_symmetry_tfs()
    assert tfs.shape[1:] == (4, 4)


def test_bop_reader_default_object_and_downscale(tmp_path):
    scene = _write_bop_scene(str(tmp_path))
    r = BopSceneReader(scene, shorter_side=30)
    assert r.ob_id == 3  # first gt instance
    assert r.color_H == 30 and r.color_W == 40
    assert abs(r.get_K(0)[0, 0] - 150.0) < 1e-6
    assert r.get_color(0).shape == (30, 40, 3)
    assert r.get_depth(0).shape == (30, 40)


def test_convert_demo_scene_to_bop(tmp_path):
    """Round trip: demo scene -> BOP layout -> BopSceneReader returns the
    same GT poses/intrinsics, and the generated visible mask overlaps the
    object (tools/convert_scene_to_bop.py feeds tools/run_bop.py)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    scene_src = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "demo_data", "synth_box")
    if not os.path.exists(os.path.join(scene_src, "rgb")):
        pytest.skip("demo scene not generated")
    from tools.convert_scene_to_bop import main as convert

    bop_scene = convert(scene_src, str(tmp_path), obj_id=7)
    r = BopSceneReader(bop_scene, ob_id=7)
    assert len(r) >= 2

    gt_src = np.loadtxt(f"{scene_src}/annotated_poses/0000.txt")
    gt_bop = r.get_gt_pose(0)
    np.testing.assert_allclose(gt_bop, gt_src, atol=1e-6)

    K = r.get_K(0)
    assert K[0, 0] > 0 and K.shape == (3, 3)
    d = r.get_depth(1)
    assert (d > 0).mean() > 0.3  # depth_scale applied sanely

    m0 = r.get_mask(0)
    assert m0.sum() > 100
    # frame-1 mask comes from GT-depth agreement; it must overlap the
    # object's projected center
    m1 = r.get_mask(1)
    assert m1.sum() > 100
    mesh = r.get_gt_mesh()
    assert 0.05 < r.get_model_diameter() < 0.2
    assert len(mesh.vertices) > 100


@pytest.mark.slow
def test_run_bop_campaign_smoke(tmp_path):
    """Full BOP campaign hermetically: convert the demo scene, register one
    frame + track one through run_bop, expect sane ADD-S (hypotheses capped
    so the CPU register stays fast)."""
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    scene_src = os.path.join(repo, "demo_data", "synth_box")
    if not os.path.exists(os.path.join(scene_src, "rgb")):
        pytest.skip("demo scene not generated")
    from tools.convert_scene_to_bop import main as convert
    from tools.run_bop import main as run_bop

    bop_scene = convert(scene_src, str(tmp_path), obj_id=1)
    out = run_bop(bop_scene, frames=2, shorter_side=288, prune_to=0,
                  max_hypotheses=24)
    assert out["frames"] == 2
    assert out["registered_frames"] == 1
    # trained weights + 24 hypotheses on CPU: expect a sub-diameter pose
    assert out["adds_mean_m"] < 0.5 * out["diameter_m"], out
