"""The fused register cascade (register_pipeline_jit) must match the staged
refine -> score -> prune -> refine -> score path it replaced."""
import jax
import jax.numpy as jnp
import numpy as np

from sixdof_tpu.io.mesh_io import TriMesh
from sixdof_tpu.models.networks import RefineNet, ScoreNetMultiPair
from sixdof_tpu.models.predict import (
    refine_poses_jit,
    register_pipeline_jit,
    score_poses_jit,
)
from sixdof_tpu.ops.geometry import depth2xyzmap
from sixdof_tpu.ops.rasterize import make_mesh_arrays


def _setup():
    v = np.array(
        [[-0.04, -0.03, -0.02], [0.04, -0.03, -0.02], [0.04, 0.03, -0.02], [-0.04, 0.03, -0.02],
         [-0.04, -0.03, 0.02], [0.04, -0.03, 0.02], [0.04, 0.03, 0.02], [-0.04, 0.03, 0.02]]
    )
    f = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5], [0, 5, 4],
                  [2, 3, 7], [2, 7, 6], [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]])
    arrays = make_mesh_arrays(TriMesh(v, f))
    K = jnp.asarray([[300.0, 0, 80], [0, 300.0, 60], [0, 0, 1]], dtype=jnp.float32)
    rng = np.random.RandomState(0)
    from sixdof_tpu.ops.lie import so3_exp_map

    n = 8
    poses = np.tile(np.eye(4, dtype=np.float32)[None], (n, 1, 1))
    poses[:, :3, :3] = np.asarray(so3_exp_map(jnp.asarray(rng.randn(n, 3) * 0.8,
                                                          dtype=jnp.float32)))
    poses[:, :3, 3] = [0.0, 0.0, 0.5]
    rgb01 = jnp.asarray(rng.rand(120, 160, 3), dtype=jnp.float32)
    depth = jnp.full((120, 160), 0.5, dtype=jnp.float32)
    model = RefineNet(c_in=6)
    hw = (32, 32)
    dummy = jnp.zeros((1, *hw, 6), dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), dummy, dummy)["params"]
    smodel = ScoreNetMultiPair(c_in=6)
    # non-degenerate score head (the default is zero-init for training)
    sparams = smodel.init(jax.random.PRNGKey(1), dummy, dummy, 1)["params"]
    sparams["linear"]["kernel"] = jax.random.normal(jax.random.PRNGKey(2),
                                                    sparams["linear"]["kernel"].shape) * 0.05
    return arrays, K, jnp.asarray(poses), rgb01, depth, model, params, smodel, sparams, hw


def test_fused_register_matches_staged():
    arrays, K, poses, rgb01, depth, model, params, smodel, sparams, hw = _setup()
    diam, cr, tn, rn = 0.1, 1.2, 0.02, 0.3490658503988659
    prune_to, coarse_iters, iters = 4, 1, 3
    chw = (16, 16)

    fused_poses, fused_scores = register_pipeline_jit(
        model, params, smodel, sparams, arrays, poses, rgb01, depth, K,
        diam, cr, tn, rn, prune_to=prune_to, coarse_iters=coarse_iters,
        iterations=iters, out_hw=hw, coarse_hw=chw, score_mode="hybrid",
    )

    # staged reference
    xyz = depth2xyzmap(depth, K)
    coarse = refine_poses_jit(model, params, arrays, poses, rgb01, xyz, K, diam,
                              cr, tn, rn, iterations=coarse_iters, out_hw=chw)
    cs = score_poses_jit(smodel, sparams, arrays, coarse, rgb01, xyz, K, diam, cr,
                         out_hw=chw, mode="hybrid")
    keep = np.argsort(-np.asarray(cs))[:prune_to]
    fine = refine_poses_jit(model, params, arrays, coarse[keep], rgb01, xyz, K, diam,
                            cr, tn, rn, iterations=iters - coarse_iters, out_hw=hw)
    fs = score_poses_jit(smodel, sparams, arrays, fine, rgb01, xyz, K, diam, cr,
                         out_hw=hw, mode="hybrid")
    order = np.argsort(-np.asarray(fs))

    np.testing.assert_allclose(np.asarray(fused_poses), np.asarray(fine)[order],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused_scores), np.asarray(fs)[order],
                               rtol=1e-5, atol=1e-5)


def test_fused_register_no_prune():
    """prune_to=0 runs the full grid for all iterations (reference behavior)."""
    arrays, K, poses, rgb01, depth, model, params, smodel, sparams, hw = _setup()
    diam, cr, tn, rn = 0.1, 1.2, 0.02, 0.3490658503988659
    fused_poses, fused_scores = register_pipeline_jit(
        model, params, smodel, sparams, arrays, poses, rgb01, depth, K,
        diam, cr, tn, rn, prune_to=0, coarse_iters=2, iterations=2,
        out_hw=hw, coarse_hw=None, score_mode="depth",
    )
    assert fused_poses.shape == poses.shape
    s = np.asarray(fused_scores)
    assert (np.diff(s) <= 1e-6).all()  # sorted descending


def test_fused_register_progressive_schedule():
    """prune_schedule=((1,6),(1,4)) must match the staged progressive path."""
    arrays, K, poses, rgb01, depth, model, params, smodel, sparams, hw = _setup()
    diam, cr, tn, rn = 0.1, 1.2, 0.02, 0.3490658503988659
    chw = (16, 16)
    schedule = ((1, 6), (1, 4))
    iters = 4

    fused_poses, fused_scores = register_pipeline_jit(
        model, params, smodel, sparams, arrays, poses, rgb01, depth, K,
        diam, cr, tn, rn, prune_to=0, coarse_iters=2, iterations=iters,
        out_hw=hw, coarse_hw=chw, score_mode="hybrid", prune_schedule=schedule,
    )

    xyz = depth2xyzmap(depth, K)
    p = poses
    remaining = iters
    for stage_iters, keep_k in schedule:
        p = refine_poses_jit(model, params, arrays, p, rgb01, xyz, K, diam,
                             cr, tn, rn, iterations=stage_iters, out_hw=chw)
        s = score_poses_jit(smodel, sparams, arrays, p, rgb01, xyz, K, diam, cr,
                            out_hw=chw, mode="hybrid")
        keep = np.argsort(-np.asarray(s))[:keep_k]
        p = p[jnp.asarray(keep)]
        remaining -= stage_iters
    p = refine_poses_jit(model, params, arrays, p, rgb01, xyz, K, diam,
                         cr, tn, rn, iterations=remaining, out_hw=hw)
    fs = score_poses_jit(smodel, sparams, arrays, p, rgb01, xyz, K, diam, cr,
                         out_hw=hw, mode="hybrid")
    order = np.argsort(-np.asarray(fs))

    assert fused_poses.shape == (4, 4, 4)
    np.testing.assert_allclose(np.asarray(fused_poses), np.asarray(p)[order],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused_scores), np.asarray(fs)[order],
                               rtol=1e-5, atol=1e-5)


def test_fused_register_polish_matches_staged():
    """polish_top/polish_iters: the top-K get extra refine iterations and the
    polished candidates JOIN the ranking pool (concat, polished first)."""
    arrays, K, poses, rgb01, depth, model, params, smodel, sparams, hw = _setup()
    diam, cr, tn, rn = 0.1, 1.2, 0.02, 0.3490658503988659
    P, PI = 3, 2

    fused_poses, fused_scores = register_pipeline_jit(
        model, params, smodel, sparams, arrays, poses, rgb01, depth, K,
        diam, cr, tn, rn, prune_to=0, coarse_iters=2, iterations=2,
        out_hw=hw, coarse_hw=None, score_mode="hybrid",
        polish_top=P, polish_iters=PI,
    )
    assert fused_poses.shape == (len(poses) + P, 4, 4)
    s = np.asarray(fused_scores)
    assert (np.diff(s) <= 1e-6).all()  # sorted descending

    # staged reference: refine all, score, polish top-P, concat, sort
    xyz = depth2xyzmap(depth, K)
    p = refine_poses_jit(model, params, arrays, poses, rgb01, xyz, K, diam,
                         cr, tn, rn, iterations=2, out_hw=hw)
    sc = score_poses_jit(smodel, sparams, arrays, p, rgb01, xyz, K, diam, cr,
                         out_hw=hw, mode="hybrid")
    top = np.argsort(-np.asarray(sc))[:P]
    pol = refine_poses_jit(model, params, arrays, p[jnp.asarray(top)], rgb01,
                           xyz, K, diam, cr, tn, rn, iterations=PI, out_hw=hw)
    ps = score_poses_jit(smodel, sparams, arrays, pol, rgb01, xyz, K, diam, cr,
                         out_hw=hw, mode="hybrid")
    pool_p = np.concatenate([np.asarray(pol), np.asarray(p)])
    pool_s = np.concatenate([np.asarray(ps), np.asarray(sc)])
    order = np.argsort(-pool_s)
    np.testing.assert_allclose(np.asarray(fused_poses), pool_p[order], atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused_scores), pool_s[order],
                               rtol=1e-5, atol=1e-5)


def test_estimater_polish_staged_path(tmp_path):
    """FoundationPose(polish_top=..) staged register returns a valid pool and
    the winner's score is >= the no-polish winner's (the pool only grows)."""
    from sixdof_tpu.estimater import FoundationPose
    from sixdof_tpu.io.mesh_io import TriMesh
    from sixdof_tpu.models.predict import PoseRefinePredictor, ScorePredictor

    v = np.array(
        [[-0.04, -0.03, -0.02], [0.04, -0.03, -0.02], [0.04, 0.03, -0.02], [-0.04, 0.03, -0.02],
         [-0.04, -0.03, 0.02], [0.04, -0.03, 0.02], [0.04, 0.03, 0.02], [-0.04, 0.03, 0.02]]
    )
    f = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5], [0, 5, 4],
                  [2, 3, 7], [2, 7, 6], [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]])
    mesh = TriMesh(v, f)
    cfg = {"input_resize": (24, 24)}
    ref = PoseRefinePredictor(cfg=dict(cfg))
    sc = ScorePredictor(cfg=dict(cfg, score_mode="depth"))
    rng = np.random.RandomState(3)
    rgb = (rng.rand(60, 80, 3) * 255).astype(np.uint8)
    depth = np.full((60, 80), 0.5, dtype=np.float32)
    K = np.array([[150.0, 0, 40], [0, 150.0, 30], [0, 0, 1]])
    mask = np.zeros((60, 80), dtype=np.uint8)
    mask[20:40, 30:50] = 1

    results = {}
    for ptop in (0, 3):
        est = FoundationPose(model_pts=mesh.vertices, model_normals=None,
                             mesh=mesh, refiner=ref, scorer=sc, debug=2,
                             debug_dir=str(tmp_path), polish_top=ptop,
                             polish_iters=1)
        est.rot_grid = est.rot_grid[:6]
        pose = est.register(K=K, rgb=rgb, depth=depth, ob_mask=mask, iteration=2)
        assert pose.shape == (4, 4)
        results[ptop] = (len(est.poses), est.scores[0])
    assert results[3][0] == results[0][0] + 3  # pool grew by polish_top
    assert results[3][1] >= results[0][1] - 1e-5  # winner never worse


def test_occlusion_substitution_semantics():
    """_make_AB(occ_sub=True): pixels where the observation is >1 cm nearer
    than the render get the rendered branch's values (zero residual); a
    global too-near observation (wrong hypothesis z, frac >= 0.6) must NOT
    be substituted (it is the move-closer signal, not an occluder)."""
    from sixdof_tpu.models.predict import _make_AB

    arrays, K, poses, rgb01, depth, *_ = _setup()
    pose = poses[:1]
    hw = (32, 32)

    # real scene: object at z=0.5 with an "occluder" band at z=0.4 covering
    # the left third of the image
    depth_occ = np.asarray(depth).copy()
    depth_occ[:, :50] = 0.4
    xyz_map = depth2xyzmap(jnp.asarray(depth_occ), K)

    def ab(occ_sub):
        return _make_AB(arrays, pose, rgb01, xyz_map, K, 1.2, 0.1, hw,
                        normalize_xyz=False, invalid_z_thresh=0.001,
                        occ_sub=occ_sub)

    A0, B0, _, _ = ab(False)
    A1, B1, _, _ = ab(True)
    assert np.allclose(np.asarray(A0), np.asarray(A1))
    zA = np.asarray(A0[..., 5]) + 0.5  # xyz channel is center-subtracted
    zB = np.asarray(B0[..., 5]) + 0.5
    occ = (zA > 0.001 + 0.5 - 0.5) & (np.asarray(B0[..., 5]) != 0)
    occ = (zA > 0.001) & (zB > 0.001) & (zB < zA - 0.01)
    assert occ.any(), "fixture must actually occlude render pixels"
    # substituted pixels equal the render branch; untouched pixels unchanged
    assert np.allclose(np.asarray(B1)[occ], np.asarray(A1)[occ], atol=1e-6)
    assert np.allclose(np.asarray(B1)[~occ], np.asarray(B0)[~occ], atol=1e-6)

    # wrong-z case: EVERY observed pixel nearer than the render -> gate off
    xyz_near = depth2xyzmap(jnp.asarray(np.full_like(depth_occ, 0.42)), K)
    _, B2_off, _, _ = _make_AB(arrays, pose, rgb01, xyz_near, K, 1.2, 0.1, hw,
                               normalize_xyz=False, invalid_z_thresh=0.001,
                               occ_sub=False)
    _, B2_on, _, _ = _make_AB(arrays, pose, rgb01, xyz_near, K, 1.2, 0.1, hw,
                              normalize_xyz=False, invalid_z_thresh=0.001,
                              occ_sub=True)
    assert np.allclose(np.asarray(B2_on), np.asarray(B2_off), atol=1e-6)


def test_trainer_occ_sub_matches_inference_rule():
    """TrainConfig.occ_sub composes B exactly like _make_AB(occ_sub=True):
    wherever B is >1 cm nearer than A's render (and the per-sample gate is
    on), B's channels equal A's."""
    from sixdof_tpu.parallel.train import TrainConfig, make_refiner_batch

    arrays, K, *_ = _setup()
    kwargs = dict(batch_size=8, input_hw=(32, 32), p_occlusion=1.0)
    key = jax.random.PRNGKey(3)
    A0, B0, dt0, dw0 = make_refiner_batch(key, arrays, K, 0.1,
                                          TrainConfig(occ_sub=False, **kwargs))
    A1, B1, dt1, dw1 = make_refiner_batch(key, arrays, K, 0.1,
                                          TrainConfig(occ_sub=True, **kwargs))
    A0, B0, A1, B1 = map(np.asarray, (A0, B0, A1, B1))
    # same key -> same scenes/poses/targets; only B's occluded pixels differ
    assert np.allclose(A0, A1)
    assert np.allclose(np.asarray(dt0), np.asarray(dt1))
    assert np.allclose(np.asarray(dw0), np.asarray(dw1))
    changed = ~np.all(np.isclose(B0, B1, atol=1e-6), axis=-1)
    assert changed.any(), "p_occlusion=1.0 must substitute somewhere"
    # every substituted pixel carries the render branch's values
    assert np.allclose(B1[changed], A1[changed], atol=1e-6)
