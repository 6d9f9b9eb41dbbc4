"""FoundationPose engine smoke tests on the synthetic scene.

The published network weights do not ship with the reference snapshot, so
pose ACCURACY is not asserted here (that requires training, exercised in the
trainer tests) — these tests pin down the machinery: shapes, conventions,
depth preprocessing, hypothesis handling, and the centered-mesh compose.
"""
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


@pytest.fixture(scope="module")
def small_estimator(scene_dir):
    from sixdof_tpu.estimater import FoundationPose
    from sixdof_tpu.io.mesh_io import load_mesh

    mesh = load_mesh(os.path.join(scene_dir, "mesh", "model_scaled_down.obj"))
    est = FoundationPose(model_pts=mesh.vertices, model_normals=mesh.vertex_normals, mesh=mesh)
    # shrink the rotation grid so CPU tests stay fast
    est.rot_grid = est.rot_grid[:8]
    return est


def _read_frame(scene_dir, i=0, shorter_side=120):
    from sixdof_tpu.io.readers import DataReader

    class Args:
        debug = 0
        box = None
        mesh = None
        voxel_size = None
        shorter_side = 120

    return DataReader(base_dir=scene_dir, shorter_side=shorter_side, arguments=Args())


def test_reader_contract(scene_dir):
    reader = _read_frame(scene_dir)
    color = reader.get_color(0)
    depth = reader.get_depth(0)
    assert color.shape[:2] == depth.shape == (reader.color_H, reader.color_W)
    assert 0.3 < np.median(depth[depth > 0]) < 1.0
    mask = reader.get_mask(color, 0)
    assert mask.shape == depth.shape and mask.sum() > 50
    src = reader.get_source(0)
    assert len(src) > 1000
    hm, _, _, _ = reader.get_heatmap(reader.get_color(0))
    assert hm.max() <= 1.0 and hm.min() >= 0.0
    gt = reader.get_gt_pose(0)
    assert gt.shape == (4, 4)


def test_register_and_track_machinery(small_estimator, scene_dir):
    est = small_estimator
    reader = _read_frame(scene_dir)
    color = reader.get_color(0)
    depth = reader.get_depth(0)
    mask = reader.get_mask(color, 0).astype(bool)

    pose = est.register(K=reader.color_K, rgb=color, depth=depth, ob_mask=mask, iteration=1)
    assert pose.shape == (4, 4)
    # rotation block orthonormal
    R = pose[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
    # translation near the guessed center (object z ~0.55 m)
    assert 0.3 < pose[2, 3] < 0.9

    pose2 = est.track_one(rgb=color, depth=depth, K=reader.color_K, iteration=1)
    assert pose2.shape == (4, 4)
    # with an untrained refiner the update is tanh-bounded: translation moves
    # at most trans_normalizer per iteration
    assert np.linalg.norm(pose2[:3, 3] - pose[:3, 3]) < 0.05


def test_guess_translation_matches_backprojection(small_estimator, scene_dir):
    est = small_estimator
    reader = _read_frame(scene_dir)
    depth = reader.get_depth(0)
    mask = reader.get_mask(reader.get_color(0), 0)
    t = est.guess_translation(depth, mask, reader.color_K)
    gt = reader.get_gt_pose(0)
    assert np.linalg.norm(t - gt[:3, 3]) < 0.08


def test_register_empty_mask_fallback(small_estimator, scene_dir):
    est = small_estimator
    reader = _read_frame(scene_dir)
    depth = reader.get_depth(0)
    empty = np.zeros_like(depth, dtype=bool)
    pose = est.register(K=reader.color_K, rgb=reader.get_color(0), depth=depth, ob_mask=empty)
    np.testing.assert_allclose(pose[:3, :3], np.eye(3), atol=1e-9)


def test_scorer_tournament_multichunk():
    """Chunked elimination semantics (reference predict_score.py:182-214):
    final-round scores get +100 and the global argmax is the true best pose.
    Eliminated hypotheses keep their last-seen chunk logits (deviation from
    the reference's 0 — identical argmax, but the staged register path
    top-K-prunes on these scores and zeros would make that cut arbitrary)."""
    import numpy as np

    from sixdof_tpu.models.predict import ScorePredictor

    n = 10
    poses = np.zeros((n, 4, 4), dtype=np.float32)
    poses[:, 0, 0] = np.arange(n)  # identify poses by [0,0]

    # ground-truth quality: pose 7 is best everywhere
    quality = np.array([0.1, 0.5, 0.2, 0.9, 0.3, 0.8, 0.4, 3.0, 0.6, 0.7])
    calls = []

    def score_fn(p):
        ids = p[:, 0, 0].astype(int)
        calls.append(ids.copy())
        return quality[ids]

    scores = np.asarray(ScorePredictor._tournament(score_fn, poses, max_batch=4))
    assert scores.shape == (n,)
    assert int(np.argmax(scores)) == 7
    # final-round winners carry +100
    assert scores[7] > 100.0
    # eliminated hypotheses keep their round-1 logits, so a top-K cut over
    # the full score vector ranks them by quality instead of arbitrarily
    finals = scores > 50.0
    np.testing.assert_allclose(scores[~finals], quality[~finals], atol=1e-6)
    top4 = set(np.argsort(-scores)[:4])
    assert 3 in top4 and 5 in top4  # next-best qualities survive a K=4 prune
    # round 1: ceil(10/4)=3 chunks; round 2: 3 <= 4 -> final
    assert len(calls) == 4


def test_deepim_trans_decode_identity():
    """deepim decode (predict_pose_refine.py:201-215): trans=(0,0,1) must be
    a fixed point (uv offset 0, z multiplier 1 -> zero translation delta)."""
    import jax.numpy as jnp
    import numpy as np

    K = jnp.asarray([[300.0, 0, 80], [0, 300.0, 60], [0, 0, 1]], dtype=jnp.float32)
    tf_to_crops = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (2, 1, 1))
    poses = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (2, 1, 1))
    poses = poses.at[:, :3, 3].set(jnp.asarray([[0.01, -0.02, 0.5], [0.0, 0.0, 0.6]]))
    out_trans = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])

    centers = poses[:, :3, 3]
    z_pred = out_trans[:, 2] * centers[:, 2]
    uvs = jnp.einsum("ij,bj->bi", K, centers)
    uvs = uvs / uvs[:, 2:3]
    uvA_crop = jnp.einsum("bij,bj->bi", tf_to_crops, uvs)[:, :2]
    uv_pred_crop = uvA_crop + out_trans[:, :2] * 160
    uvh = jnp.concatenate([uv_pred_crop, jnp.ones_like(z_pred)[:, None]], axis=-1)
    uv_pred = jnp.einsum("bij,bj->bi", jnp.linalg.inv(tf_to_crops), uvh)
    uv_pred = uv_pred[:, :2] / uv_pred[:, 2:3]
    ray = jnp.einsum("ij,bj->bi", jnp.linalg.inv(K),
                     jnp.concatenate([uv_pred, jnp.ones_like(z_pred)[:, None]], axis=-1))
    trans_delta = ray * z_pred[:, None] - centers
    np.testing.assert_allclose(np.asarray(trans_delta), 0.0, atol=1e-5)


def test_track_crop_matches_full_frame(small_estimator, scene_dir):
    """Host-side upload cropping (track_crop) is a transfer optimization:
    tracked poses must match the full-frame path (both sync and pipelined)."""
    est = small_estimator
    reader = _read_frame(scene_dir)
    K = reader.color_K
    frames = [(reader.get_color(i), reader.get_depth(i)) for i in range(len(reader))]
    c0, d0 = frames[0]
    mask = reader.get_mask(c0, 0).astype(bool)

    def run(track_crop, sync):
        est.track_crop = track_crop
        est._crop_size = None
        est.register(K=K, rgb=c0, depth=d0, ob_mask=mask, iteration=1)
        out = []
        pending = []
        for c, d in frames:
            h = est.track_one(rgb=c, depth=d, K=K, iteration=1, sync=sync)
            (out if sync else pending).append(h)
        out.extend(p.numpy() for p in pending)
        return np.stack(out)

    ref_poses = run(track_crop=False, sync=True)
    crop_sync = run(track_crop=True, sync=True)
    crop_pipe = run(track_crop=True, sync=False)
    assert est._crop_size, "crop was never engaged on this scene"
    np.testing.assert_allclose(crop_sync, ref_poses, atol=1e-4)
    np.testing.assert_allclose(crop_pipe, ref_poses, atol=1e-4)


def test_track_crop_window_fallbacks(small_estimator):
    """Full-frame fallback when the object is too close or center off-image."""
    est = small_estimator
    K = np.array([[300.0, 0, 64.0], [0, 300.0, 48.0], [0, 0, 1.0]])
    est._crop_size = None
    est._last_center_px = None
    # too close: needed window exceeds the frame
    p = np.eye(4); p[2, 3] = 0.02
    est._crop_pose_host = p
    assert est._crop_window(K, (96, 128)) is None
    # comfortable distance: a window comes back, inside bounds
    est._crop_size = None
    p = np.eye(4); p[2, 3] = 2.0
    est._crop_pose_host = p
    win = est._crop_window(K, (96, 128))
    assert win is not None
    oy, ox, size = win
    assert 0 <= oy <= 96 - size and 0 <= ox <= 128 - size
    # projected center off-image -> full frame
    p2 = p.copy(); p2[0, 3] = 10.0
    est._crop_pose_host = p2
    assert est._crop_window(K, (96, 128)) is None


def test_track_crop_motion_guard_and_growth_fallback(small_estimator):
    """Fast image motion of the (lagged) crop center falls back to the full
    frame; an object closing in past the session window disables cropping."""
    est = small_estimator
    K = np.array([[300.0, 0, 64.0], [0, 300.0, 48.0], [0, 0, 1.0]])
    est._crop_size = None
    est._last_center_px = None
    p = np.eye(4); p[2, 3] = 2.0
    est._crop_pose_host = p
    assert est._crop_window(K, (96, 128)) is not None
    # large in-image jump of the projected center -> motion guard kicks in
    p2 = p.copy(); p2[0, 3] = 0.2  # ~30 px of image motion
    est._crop_pose_host = p2
    assert est._crop_window(K, (96, 128)) is None
    # small drift is fine again
    p3 = p2.copy(); p3[0, 3] += 0.001
    est._crop_pose_host = p3
    assert est._crop_window(K, (96, 128)) is not None
    # object comes much closer: need grows past the session window -> crop
    # permanently reverts to full frame (no mid-loop recompile)
    p4 = p3.copy(); p4[2, 3] = 0.2
    est._crop_pose_host = p4
    assert est._crop_window(K, (96, 128)) is None
    assert est._crop_size == 0


def test_capture_ctx_guards(rng=np.random.RandomState(0)):
    """CaptureContext rejects calls for a different scene and re-uploads rays
    when intensities/mask change (content-keyed cache)."""
    import pytest as _pytest

    from sixdof_tpu.app import icp_pipeline as ip
    from sixdof_tpu.io.mesh_io import PointCloud, TriMesh

    tgt = PointCloud(rng.rand(500, 3) * 100)
    v = np.array([[0, 0, -25.0], [35.0, 0, 0], [-20.0, 25.0, 0], [-20.0, -25.0, 0]])
    f = np.array([[0, 1, 2], [0, 2, 3], [0, 3, 1], [1, 3, 2]])
    mesh = TriMesh(v, f)
    c2d = np.eye(4)
    ctx = ip.CaptureContext(tgt, mesh, c2d)

    rays = rng.rand(5, 3)
    mask = np.ones(5, dtype=bool)
    inten = np.linspace(0.1, 0.9, 5)
    _, _, i1 = ctx.rays_device(rays, mask, inten)
    np.testing.assert_allclose(i1, inten)
    # same dirs, different intensities -> cache must NOT serve stale values
    inten2 = inten * 0.5
    _, _, i2 = ctx.rays_device(rays, mask, inten2)
    np.testing.assert_allclose(i2, inten2)
    # same dirs, different mask -> new device mask
    mask2 = mask.copy(); mask2[0] = False
    _, m3, _ = ctx.rays_device(rays, mask2, inten2)
    assert not bool(np.asarray(m3)[0])

    # wrong-scene guard
    other_tgt = PointCloud(rng.rand(400, 3) * 100)
    with _pytest.raises(ValueError):
        ctx.check(other_tgt, mesh, c2d)
    with _pytest.raises(ValueError):
        ctx.check(tgt, mesh, np.diag([1.0, 1.0, 1.0, 2.0]))
    ctx.check(tgt, mesh, c2d)  # matching args pass


def test_precompile_async_then_register(small_estimator, scene_dir):
    """precompile_async compiles the fused/track programs in background
    threads; register() after the fused thread finishes matches a plain call
    (in-process lower().compile() reuse is the cold-start fix, VERDICT r2
    item 4), and WHILE the fused compile is in flight register() detours
    through the staged path instead of blocking."""
    est = small_estimator
    reader = _read_frame(scene_dir)
    color = reader.get_color(0)
    depth = reader.get_depth(0)
    mask = reader.get_mask(color, 0).astype(bool)

    baseline = est.register(K=reader.color_K, rgb=color, depth=depth,
                            ob_mask=mask, iteration=1)
    t = est.precompile_async(reader.color_K, depth.shape, iteration=1,
                             track_iteration=1)
    assert t is not None
    t.join(timeout=600)
    assert not t.is_alive()
    pose = est.register(K=reader.color_K, rgb=color, depth=depth,
                        ob_mask=mask, iteration=1)
    np.testing.assert_allclose(pose, baseline, atol=1e-5)
    tracked = est.track_one(rgb=color, depth=depth, K=reader.color_K, iteration=1)
    assert tracked.shape == (4, 4)
    assert not est._precompile_track_thread.is_alive()  # track_one joined it

    # cold-start detour: while the fused compile is "in flight", register
    # must answer via the staged path with the same result
    import threading

    gate = threading.Event()
    blocker = threading.Thread(target=gate.wait, daemon=True)
    blocker.start()
    est._precompile_fused_thread = blocker
    try:
        assert est._fused_register_pending()
        pose_staged = est.register(K=reader.color_K, rgb=color, depth=depth,
                                   ob_mask=mask, iteration=1)
    finally:
        gate.set()
        blocker.join(timeout=60)
    np.testing.assert_allclose(pose_staged, baseline, atol=1e-4)


def test_depth_polish_recovers_rotation(small_estimator, scene_dir):
    """register()'s depth polish (icp_polish_two_pass of the masked observed
    cloud against the model cloud) pulls a ~10-deg-perturbed pose to the
    depth optimum — the lever that closes the learned cascade's clutter
    rank0 residual without retraining."""
    from sixdof_tpu.metrics import rotation_angle_deg
    from sixdof_tpu.ops.lie import euler_matrix

    est = small_estimator
    reader = _read_frame(scene_dir)
    depth = reader.get_depth(0)
    K = reader.color_K
    gt = reader.get_gt_pose(0)
    mask = (depth > 0.001)
    # GT in the CENTERED-mesh frame, perturbed by ~10 deg + a few mm
    gt_c = gt @ np.linalg.inv(est.get_tf_to_centered_mesh())
    noise = euler_matrix(0.12, -0.08, 0.1)
    noise[:3, 3] = [0.004, -0.003, 0.002]
    perturbed = gt_c @ noise
    r_before = rotation_angle_deg(perturbed[:3, :3], gt_c[:3, :3])
    assert r_before > 8.0
    polished = est._depth_polish(perturbed, np.asarray(depth), mask, K)
    r_after = rotation_angle_deg(polished[:3, :3], gt_c[:3, :3])
    assert r_after < 2.0, f"polish left {r_after:.2f} deg (was {r_before:.2f})"
    # degenerate mask: returns the input unchanged
    empty = np.zeros_like(mask)
    same = est._depth_polish(perturbed, np.asarray(depth), empty, K)
    np.testing.assert_array_equal(same, perturbed)
