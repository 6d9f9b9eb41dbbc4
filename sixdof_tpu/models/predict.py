"""Refiner / scorer predictors: crop construction + iterative pose updates.

Mirrors the reference predictors (learning/training/predict_pose_refine.py:93,
predict_score.py:117) with the whole render->warp->network->update iteration
fused into ONE jitted device program:

- `make_crop_data_batch` (predict_pose_refine.py:26-89) becomes in-graph ops:
  crop transforms (ops/geometry.py), hypothesis renders (ops/rasterize.py) and
  real-image homography warps (ops/warp.py);
- the refiner's python loop over iterations (predict_pose_refine.py:182-234)
  becomes `lax.scan`;
- the scorer's tournament while-loop degenerates to a single pass when the
  batch covers all hypotheses (predict_score.py:206-213), which is exactly
  what we jit;
- chunked forward passes (bs=1024/512 in the reference) are unnecessary: the
  hypothesis batch is one padded static array.

The published checkpoints are not bundled with the reference snapshot; params
initialize from a fixed seed unless a torch .pth (converted via
models/torch_convert.py) or an orbax checkpoint is provided.
"""
from __future__ import annotations

import functools
import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.geometry import (
    compute_crop_window_tf_batch,
    egocentric_delta_pose_to_pose,
)
from ..ops.lie import rotation_6d_to_matrix, so3_exp_map
from ..ops.rasterize import MeshArrays, render_batch
from ..ops.warp import warp_crop_batch
from .networks import RefineNet, ScoreNetMultiPair

DEFAULT_REFINER_CFG = dict(
    input_resize=(160, 160),
    crop_ratio=1.2,
    use_normal=False,
    use_BN=False,
    c_in=6,
    n_view=1,
    trans_rep="tracknet",
    rot_rep="axis_angle",
    zfar=np.inf,
    normalize_xyz=False,
    # public FoundationPose refiner normalizers
    trans_normalizer=0.02,
    rot_normalizer=0.3490658503988659,  # 20 deg
    # visibility substitution (see _make_AB).  MUST match how the checkpoint
    # was trained (TrainConfig.occ_sub): a net trained with occluders visible
    # diverges on substituted inputs (measured 11 deg -> 44 deg) and vice
    # versa.  weights/OCC_SUB marker files flip this at load (predictors).
    occ_sub=False,
)

DEFAULT_SCORER_CFG = dict(
    input_resize=(160, 160),
    crop_ratio=1.2,
    use_normal=False,
    use_BN=False,
    c_in=6,
    zfar=np.inf,
    normalize_xyz=False,
    # 'network' = reference-faithful learned scorer; 'depth' = analytic
    # render-vs-observed alignment (no training needed); 'hybrid' = both
    score_mode="hybrid",
)


def to_rgb01(rgb):
    """uint8-or-float image -> float32 [0,1] device array.

    Treats anything with max > 1.5 as 0-255 scale (uint8 images are always
    caught; a float frame already in [0,1] is left alone).
    """
    arr = np.asarray(rgb)
    rgb01 = jnp.asarray(arr, dtype=jnp.float32)
    if float(arr.max(initial=0.0)) > 1.5:
        rgb01 = rgb01 / 255.0
    return rgb01


def _make_AB(mesh, poses, rgb01, xyz_map, K, crop_ratio, mesh_diameter, out_hw,
             normalize_xyz, invalid_z_thresh, backface_cull=False, occ_sub=False):
    """Build the (A=render, B=real) 6-channel crop pair for a pose batch.

    @rgb01: (H,W,3) in [0,1]; @xyz_map: (H,W,3) camera-frame meters.
    @occ_sub: visibility substitution for the refiner — pixels where the
    observed depth is >1 cm NEARER than the hypothesis render are occluder
    pixels (something sits between camera and object); copying the rendered
    branch's values into the real branch there makes those pixels carry ZERO
    pose residual instead of a biased one (the refiner otherwise converges to
    a fixed point that trades occluder overlap against visible-pixel fit —
    measured ~11 deg under a 25%-occluder).  Per-pose gate: if the "nearer"
    fraction is large, the cause is a wrong hypothesis z, not an occluder —
    substitution would erase the move-closer signal, so it is disabled.
    Returns (A, B, tf_to_crops), NHWC.
    """
    tf_to_crops = compute_crop_window_tf_batch(
        poses, K, crop_ratio=crop_ratio, out_size=(out_hw[1], out_hw[0]),
        mesh_diameter=mesh_diameter,
    )
    rend = render_batch(mesh, poses, K, tf_to_crops, out_hw=out_hw, use_light=True,
                        backface_cull=backface_cull)
    rgbA = rend["color"]
    xyzA = rend["xyz_map"]
    # crop tfs are axis-aligned affine -> separable matmul warp (MXU), not a
    # random gather (see ops/warp.py)
    rgbB = warp_crop_batch(rgb01, tf_to_crops, out_hw, mode="bilinear")
    xyzB = warp_crop_batch(xyz_map, tf_to_crops, out_hw, mode="nearest")

    center = poses[:, :3, 3][:, None, None, :]  # (B,1,1,3)
    # meter-space, center-subtracted copies + observed-validity BEFORE any
    # normalization: the analytic score consumes these so its thresholds stay
    # in meters and depth holes stay detectable whatever the net convention
    rend = dict(rend)
    rend["obs_validB"] = xyzB[..., 2] > invalid_z_thresh
    rend["xyzA_m"] = xyzA - center
    rend["xyzB_m"] = xyzB - center
    sub = None
    if occ_sub:
        # occ_sub is False | True | a float gate ceiling: True keeps the
        # legacy 0.6 ceiling; a float raises/lowers it.  The ceiling guards
        # wrong-hypothesis-z recovery (all-nearer observations mean "move
        # closer", not "occluded") but turning substitution OFF above it
        # leaves a substitution-trained net out-of-distribution exactly on
        # heavy occlusion — r4 measured the 0.6-gated occ_sub refiner failing
        # the 57%-occluded scene it was meant to help; train-time and
        # inference ceilings MUST match (weights/<run>/OCC_SUB marker).
        hi = 0.6 if occ_sub is True else float(occ_sub)
        validA = xyzA[..., 2] > invalid_z_thresh
        validB = xyzB[..., 2] > invalid_z_thresh
        both = validA & validB
        occ = both & (xyzB[..., 2] < xyzA[..., 2] - 0.01)
        frac = occ.sum(axis=(1, 2)) / jnp.maximum(both.sum(axis=(1, 2)), 1)
        gate = (frac > 0.02) & (frac < hi)
        sub = (occ & gate[:, None, None])[..., None]
    if normalize_xyz:
        r = mesh_diameter / 2.0
        invalidA = xyzA[..., 2:3] < invalid_z_thresh
        invalidB = xyzB[..., 2:3] < invalid_z_thresh
        xyzA = (xyzA - center) / r
        xyzB = (xyzB - center) / r
        xyzA = jnp.where(invalidA | (jnp.abs(xyzA) >= 2).any(-1, keepdims=True), 0.0, xyzA)
        xyzB = jnp.where(invalidB | (jnp.abs(xyzB) >= 2).any(-1, keepdims=True), 0.0, xyzB)
    else:
        xyzA = rend["xyzA_m"]
        xyzB = rend["xyzB_m"]
    A = jnp.concatenate([rgbA, xyzA], axis=-1)
    B = jnp.concatenate([rgbB, xyzB], axis=-1)
    if sub is not None:
        # network inputs only: the analytic score's meter-space copies in
        # `rend` keep the real observations (it has its own visibility model)
        B = jnp.where(sub, A, B)
    return A, B, tf_to_crops, rend


@functools.partial(
    jax.jit,
    static_argnames=("model", "iterations", "out_hw", "normalize_xyz", "trans_rep", "rot_rep",
                     "backface_cull", "occ_sub"),
)
def refine_poses_jit(
    model,
    params,
    mesh: MeshArrays,
    poses,
    rgb01,
    xyz_map,
    K,
    mesh_diameter,
    crop_ratio,
    trans_normalizer,
    rot_normalizer,
    iterations: int,
    out_hw=(160, 160),
    normalize_xyz=False,
    trans_rep="tracknet",
    rot_rep="axis_angle",
    backface_cull=False,
    occ_sub=False,
):
    """lax.scan of render->compare->update refinement iterations."""

    def one_iter(poses, _):
        A, B, tf_to_crops, _ = _make_AB(
            mesh, poses, rgb01, xyz_map, K, crop_ratio, mesh_diameter, out_hw,
            normalize_xyz, invalid_z_thresh=0.001, backface_cull=backface_cull,
            occ_sub=occ_sub,
        )
        out = model.apply({"params": params}, A, B)
        if trans_rep == "tracknet":
            if not normalize_xyz:
                trans_delta = jnp.tanh(out["trans"]) * trans_normalizer
            else:
                trans_delta = out["trans"]
        elif trans_rep == "deepim":
            # z-scaled image-space decode (predict_pose_refine.py:201-215):
            # uv offset in crop pixels x input size, z multiplicative
            centers = poses[:, :3, 3]
            z_pred = out["trans"][:, 2] * centers[:, 2]
            uvs = jnp.einsum("ij,bj->bi", K, centers)
            uvs = uvs / uvs[:, 2:3]
            uvA_crop = jnp.einsum("bij,bj->bi", tf_to_crops, uvs)[:, :2]
            uv_pred_crop = uvA_crop + out["trans"][:, :2] * out_hw[0]
            uvh = jnp.concatenate([uv_pred_crop, jnp.ones_like(z_pred)[:, None]], axis=-1)
            uv_pred = jnp.einsum("bij,bj->bi", jnp.linalg.inv(tf_to_crops), uvh)
            uv_pred = uv_pred[:, :2] / uv_pred[:, 2:3]
            ray = jnp.einsum(
                "ij,bj->bi", jnp.linalg.inv(K),
                jnp.concatenate([uv_pred, jnp.ones_like(z_pred)[:, None]], axis=-1),
            )
            trans_delta = ray * z_pred[:, None] - centers
        else:
            trans_delta = out["trans"]
        if rot_rep == "axis_angle":
            rot_mat_delta = jnp.swapaxes(
                so3_exp_map(jnp.tanh(out["rot"]) * rot_normalizer), -1, -2
            )
        elif rot_rep == "6d":
            rot_mat_delta = jnp.swapaxes(rotation_6d_to_matrix(out["rot"]), -1, -2)
        else:
            raise RuntimeError(rot_rep)
        if normalize_xyz:
            # global post-scale, all trans_reps (predict_pose_refine.py:229)
            trans_delta = trans_delta * (mesh_diameter / 2.0)
        new_poses = egocentric_delta_pose_to_pose(poses, trans_delta, rot_mat_delta)
        return new_poses, None

    poses, _ = jax.lax.scan(one_iter, poses.astype(jnp.float32), None, length=iterations)
    return poses


def _depth_alignment_score(A, B, rend, poses, mesh_diameter):
    """Occlusion-aware analytic render-vs-observed score (higher = better).

    Model-based alternative/complement to the learned scorer.  Visibility
    reasoning per rendered pixel (the naive mean-distance score PENALIZES the
    true pose under partial occlusion — the occluded quarter of the object
    contributes max geometric error exactly when the hypothesis is right):

      - observed NEARER than the render by > tau: an occluder in front of the
        hypothesized surface — consistent with the hypothesis, excluded;
      - |render - observed| <= tau: geometric support (inlier);
      - observed FARTHER than the render by > tau: violation — the sensor
        sees through where the hypothesis claims surface.

    Color agreement is measured on the supporting pixels only: "where the
    geometry matches, does the texture?" — the ~180-deg-flip discriminator
    for near-symmetric shapes.
    """
    alpha = rend["alpha"]  # (B,H,W)
    # meter-space quantities + explicit validity from _make_AB — independent
    # of normalize_xyz (the net channels in A/B may be radius-normalized and
    # zero invalid pixels AFTER centering, which breaks both the units of
    # tau and any z-channel-based validity test)
    xyzA = rend["xyzA_m"]
    xyzB = rend["xyzB_m"]
    both = (alpha > 0) & rend["obs_validB"]
    d = jnp.linalg.norm(xyzA - xyzB, axis=-1)
    dz = xyzB[..., 2] - xyzA[..., 2]  # observed minus rendered depth
    tau = 0.05 * mesh_diameter
    occluded = both & (dz < -tau)
    support = both & (d <= tau)
    violate = both & (dz > tau)
    n_vis = jnp.maximum(both.sum(axis=(1, 2)) - occluded.sum(axis=(1, 2)), 1)
    support_frac = support.sum(axis=(1, 2)) / n_vis
    violate_frac = violate.sum(axis=(1, 2)) / n_vis
    n_sup = jnp.maximum(support.sum(axis=(1, 2)), 1)
    col = -jnp.sum(
        jnp.where(support[..., None], jnp.abs(A[..., :3] - B[..., :3]), 0.0),
        axis=(1, 2, 3),
    ) / (3 * n_sup)
    # residual sharpness inside the support band (sub-tau ranking signal)
    geom = -jnp.sum(jnp.where(support, d, 0.0), axis=(1, 2)) / n_sup
    # color weight 2.0: for near-symmetric shapes the texture term is the
    # only signal that separates a ~180-deg flip from the true orientation
    return support_frac - violate_frac + geom / tau + 2.0 * col


@functools.partial(jax.jit, static_argnames=("model", "out_hw", "normalize_xyz", "mode",
                                              "backface_cull"))
def score_poses_jit(
    model, params, mesh: MeshArrays, poses, rgb01, xyz_map, K, mesh_diameter,
    crop_ratio, out_hw=(160, 160), normalize_xyz=False, mode="network",
    backface_cull=False,
):
    """Single-pass hypothesis scoring (tournament degenerates to one pass).

    @mode: 'network' (reference-faithful learned scorer), 'depth' (analytic
    render-vs-observed alignment — training-free), or 'hybrid' (sum).
    """
    A, B, _, rend = _make_AB(
        mesh, poses, rgb01, xyz_map, K, crop_ratio, mesh_diameter, out_hw,
        normalize_xyz, invalid_z_thresh=0.1, backface_cull=backface_cull,
    )
    score = 0.0
    if mode in ("network", "hybrid"):
        out = model.apply({"params": params}, A, B, L=poses.shape[0])
        # the winning pass gets +100 like scores_global[global_ids] = scores+100
        score = score + out["score_logit"].reshape(-1) + 100.0
    if mode in ("depth", "hybrid"):
        score = score + _depth_alignment_score(A, B, rend, poses, mesh_diameter)
    return score


@functools.partial(
    jax.jit,
    static_argnames=("rmodel", "smodel", "prune_to", "coarse_iters", "iterations",
                     "out_hw", "coarse_hw", "normalize_xyz", "trans_rep", "rot_rep",
                     "score_mode", "backface_cull", "prune_schedule",
                     "score_normalize_xyz", "score_hw", "polish_top", "polish_iters",
                     "occ_sub"),
)
def register_pipeline_jit(
    rmodel, rparams, smodel, sparams, mesh: MeshArrays, poses, rgb01, depth, K,
    mesh_diameter, crop_ratio, trans_normalizer, rot_normalizer,
    prune_to, coarse_iters, iterations, out_hw=(160, 160), coarse_hw=None,
    normalize_xyz=False, trans_rep="tracknet", rot_rep="axis_angle",
    score_mode="hybrid", backface_cull=False, prune_schedule=None,
    score_crop_ratio=None, score_normalize_xyz=None, score_hw=None,
    polish_top=0, polish_iters=0, occ_sub=False,
):
    """The ENTIRE registration cascade as one device program: coarse refine
    over the full grid -> score -> top-K prune -> full-resolution refine ->
    score -> sort.  One host round trip for the whole thing (the staged path
    pays ~6 transfers; each costs ~45ms tunnel latency — see estimater.py).

    @prune_schedule: optional static tuple of (iters, keep) stages run at
    coarse_hw — progressive pruning (e.g. ((1, 128), (1, 64)) refines the
    full grid 1 iter, keeps 128, refines 1 iter, keeps 64) spends fewer
    coarse pose-iterations than the single two-iteration cut it replaces.
    Overrides (coarse_iters, prune_to); the remaining
    iterations - sum(stage iters) run at out_hw on the final survivor set.
    @depth: already-filtered depth (the host needs it for guess_translation
    and the degenerate-mask fallback, so filtering stays a separate step).
    Returns (sorted_poses (K,4,4), sorted_scores (K,)).
    """
    from ..ops.geometry import depth2xyzmap

    xyz_map = depth2xyzmap(depth, K)
    n = poses.shape[0]

    def refine(p, iters, hw):
        return refine_poses_jit(
            rmodel, rparams, mesh, p, rgb01, xyz_map, K, mesh_diameter, crop_ratio,
            trans_normalizer, rot_normalizer, iters, hw, normalize_xyz,
            trans_rep, rot_rep, backface_cull, occ_sub,
        )

    # the scorer may use its own crop/normalization convention (the reference
    # checkpoints ship separate cfgs per net); None inherits the refiner's
    s_crop = crop_ratio if score_crop_ratio is None else score_crop_ratio
    s_norm = normalize_xyz if score_normalize_xyz is None else score_normalize_xyz

    def score(p, hw):
        return score_poses_jit(
            smodel, sparams, mesh, p, rgb01, xyz_map, K, mesh_diameter, s_crop,
            hw, s_norm, score_mode, backface_cull,
        )

    if prune_schedule is None and prune_to and prune_to < n and iterations > coarse_iters:
        prune_schedule = ((coarse_iters, prune_to),)
    if prune_schedule:
        chw = coarse_hw or out_hw
        for stage_iters, keep_k in prune_schedule:
            if keep_k >= poses.shape[0] or iterations <= stage_iters:
                continue
            poses = refine(poses, stage_iters, chw)
            stage_scores = score(poses, chw)
            _, keep = jax.lax.top_k(stage_scores, keep_k)
            poses = poses[keep]
            iterations = iterations - stage_iters
    poses = refine(poses, iterations, out_hw)
    # coarse prune stages score at the coarse resolution by design; only the
    # final ranking honors a scorer-specific input resolution
    scores = score(poses, out_hw if score_hw is None else score_hw)
    if polish_top and polish_iters and polish_top <= poses.shape[0]:
        # top-K polish: the survivors of the cascade sit near the edge of the
        # refiner's convergence basin (the rotation grid is 30-deg-spaced);
        # extra iterations on just the best few walk them the rest of the way
        # in, at ~polish_top/keep_k of the final stage's cost.  Polished
        # candidates JOIN the ranking pool (concat, polished first so equal
        # scores prefer them) rather than replacing their originals — a
        # diverging polish can never evict a pose that already ranked well.
        _, keep = jax.lax.top_k(scores, polish_top)
        polished = refine(poses[keep], polish_iters, out_hw)
        pol_scores = score(polished, out_hw if score_hw is None else score_hw)
        poses = jnp.concatenate([polished, poses], axis=0)
        scores = jnp.concatenate([pol_scores, scores], axis=0)
    order = jnp.argsort(-scores)
    return poses[order], scores[order]


def pack_rgbd(rgb_u8, depth_u16):
    """(H,W,3) uint8 + (H,W) uint16-mm -> one (H,W,5) uint8 buffer.

    One packed upload = one host->device round trip per frame; over a
    remote-TPU tunnel each transfer costs ~45ms latency regardless of size.
    """
    import numpy as np

    return np.concatenate(
        [rgb_u8, depth_u16.view(np.uint8).reshape(*depth_u16.shape, 2)], axis=-1
    )


@functools.partial(
    jax.jit,
    static_argnames=("model", "iterations", "out_hw", "normalize_xyz", "trans_rep", "rot_rep",
                     "backface_cull", "occ_sub"),
)
def track_pose_jit(
    model, params, mesh: MeshArrays, pose_last, rgbd_u8, K, mesh_diameter,
    crop_ratio, trans_normalizer, rot_normalizer, iterations: int, out_hw=(160, 160),
    normalize_xyz=False, trans_rep="tracknet", rot_rep="axis_angle",
    backface_cull=False, occ_sub=False,
    polish_tgt=None, polish_tn=None, polish_tmask=None,
):
    """Fused tracking step: depth erode+bilateral -> xyz map -> refine scan.

    One device dispatch per frame (the reference issues several GPU kernels +
    host syncs per frame, estimater.py:254-266); @rgbd_u8 is the (H,W,5)
    packed frame from pack_rgbd — a single upload, unpacked on device.
    Returns (pose (1,4,4), depth_filtered).
    """
    from ..ops.depth_filter import bilateral_filter_depth, erode_depth
    from ..ops.geometry import depth2xyzmap

    rgb01 = rgbd_u8[..., :3].astype(jnp.float32) / 255.0
    depth_mm = jax.lax.bitcast_convert_type(rgbd_u8[..., 3:5], jnp.uint16)
    depth_raw = depth_mm.reshape(rgbd_u8.shape[:2]).astype(jnp.float32) / 1000.0
    depth = erode_depth(depth_raw, radius=2)
    depth = bilateral_filter_depth(depth, radius=2)
    xyz_map = depth2xyzmap(depth, K)
    poses = refine_poses_jit(
        model, params, mesh, pose_last, rgb01, xyz_map, K, mesh_diameter, crop_ratio,
        trans_normalizer, rot_normalizer, iterations, out_hw, normalize_xyz,
        trans_rep, rot_rep, backface_cull, occ_sub,
    )
    if polish_tgt is not None:
        poses = _track_depth_polish(model_mesh=mesh, poses=poses, rgb01=rgb01,
                                    xyz_map=xyz_map, K=K, crop_ratio=crop_ratio,
                                    tgt=polish_tgt, tgt_normals=polish_tn,
                                    tgt_mask=polish_tmask,
                                    mesh_diameter=mesh_diameter,
                                    backface_cull=backface_cull)
    return poses, depth


def _rigid_inv(tf):
    Rt = tf[:3, :3].T
    out = jnp.eye(4, dtype=tf.dtype)
    out = out.at[:3, :3].set(Rt)
    return out.at[:3, 3].set(-Rt @ tf[:3, 3])


def _track_depth_polish(model_mesh, poses, rgb01, xyz_map, K, crop_ratio, tgt,
                        tgt_normals, tgt_mask, mesh_diameter,
                        backface_cull=False):
    """In-graph per-frame depth polish for tracking (ZERO extra dispatches).

    After the learned refine scan, a coarse+fine point-to-plane ICP aligns
    the VISIBLE observed cloud against a dense model surface sampling — the
    net's per-frame drift under clutter/sensor noise is geometric, and the
    depth optimum removes it (measured: clutter_sensor track rot mean
    19.6 -> 3.0 deg, clutter/box 0.0 deg).

    Tracking has no object mask, so visibility comes from one extra 96x96
    render of the tracked pose (_make_AB machinery): source points are crop
    pixels where the hypothesis renders surface AND the observed depth
    agrees within 0.15 diameters — plane/background and occluder pixels are
    excluded (a naive center-ball selection let the support plane bias the
    translation 5-8 mm).  A correction-magnitude guard keeps the net pose
    whenever the polish asks for an implausibly large per-frame jump
    (>20 deg or >0.25 diameters — a wrong-basin lock, not a drift
    correction).
    """
    from ..ops.icp import icp_point_to_plane

    pose0 = poses[0]
    d = mesh_diameter
    hw = (96, 96)
    _, _, _, rend = _make_AB(model_mesh, poses, rgb01, xyz_map, K, crop_ratio,
                             mesh_diameter, hw, normalize_xyz=False,
                             invalid_z_thresh=0.001, backface_cull=backface_cull)
    center = pose0[:3, 3]
    # stride-2 subsample: ~2.3k source points constrain the 6-DOF solve as
    # well as 9.2k, and the NN distance tile (src x tgt) is HBM-bound — the
    # full 96^2 x 16k tile cost ~15 ms/frame of device time (measured),
    # strided src x 4k tgt costs ~1 ms
    xyzB = (rend["xyzB_m"][0, ::2, ::2] + center).reshape(-1, 3)
    zA = rend["xyzA_m"][0, ::2, ::2, 2].reshape(-1) + center[2]
    # erode the rendered silhouette 2 px: edge pixels whose observed depth is
    # the background just behind the surface otherwise pass the band and
    # drag the translation toward the support plane (measured 5-8 mm bias).
    # The band is 0.12d — wide enough that a net pose several mm off still
    # keeps the whole true surface selected (a tight 0.05d band went
    # asymmetric at the seed's own error, biasing the correction and letting
    # the tracking loop accumulate ~2.5 mm/frame), narrow enough that
    # occluders (nearer by >> band) and the support plane (interior pixels
    # only, behind by >= the object thickness) stay excluded.
    a2 = -jax.lax.reduce_window(-rend["alpha"][0], -jnp.inf, jax.lax.max,
                                (5, 5), (1, 1), "SAME")
    alpha = (a2[::2, ::2].reshape(-1) > 0)
    obs = rend["obs_validB"][0, ::2, ::2].reshape(-1)
    valid = alpha & obs & (jnp.abs(xyzB[:, 2] - zA) < 0.12 * d)
    init = _rigid_inv(pose0)
    r1 = icp_point_to_plane(xyzB, valid, tgt, tgt_normals, tgt_mask, init,
                            0.05 * d, max_iter=6)
    r2 = icp_point_to_plane(xyzB, valid, tgt, tgt_normals, tgt_mask,
                            r1.transformation, jnp.maximum(0.02 * d, 0.004),
                            max_iter=6)
    polished = _rigid_inv(r2.transformation)
    dR = polished[:3, :3].T @ pose0[:3, :3]
    cos_ang = jnp.clip((jnp.trace(dR) - 1.0) / 2.0, -1.0, 1.0)
    dt = jnp.linalg.norm(polished[:3, 3] - pose0[:3, 3])
    ok = (cos_ang > np.cos(np.deg2rad(20.0))) & (dt < 0.25 * d) \
        & (r2.fitness > 0.05)
    # damped half-step toward the depth optimum: the full correction fed
    # back through the net each frame OSCILLATES on plane-dominated
    # geometry (the box's in-plane DOFs are weakly observed by
    # point-to-plane, so successive full corrections overshoot +-3-5 mm in
    # z); halving the step turns the loop into a stable filter — consistent
    # corrections (rotation drift) still accumulate across frames, noise
    # damps out
    from ..ops.lie import so3_log_map

    _ALPHA = 0.7  # step fraction toward the depth optimum (0.5-0.8 stable;
    # 1.0 oscillates on plane-dominated geometry, 0.5 under-corrects fast
    # drift on degraded clutter)
    half_w = _ALPHA * so3_log_map(jnp.matmul(
        polished[:3, :3], pose0[:3, :3].T,
        precision=jax.lax.Precision.HIGHEST)[None])
    R_half = jnp.matmul(so3_exp_map(half_w)[0], pose0[:3, :3],
                        precision=jax.lax.Precision.HIGHEST)
    t_half = _ALPHA * polished[:3, 3] + (1.0 - _ALPHA) * pose0[:3, 3]
    blended = jnp.eye(4, dtype=poses.dtype)
    blended = blended.at[:3, :3].set(R_half).at[:3, 3].set(t_half)
    return jnp.where(ok, blended[None], poses)


class _PredictorBase:
    def _init_params(self, model, example_inputs, ckpt_dir, convert_fn, seed=0):
        if ckpt_dir and os.path.exists(ckpt_dir):
            if ckpt_dir.endswith(".pth"):
                from .torch_convert import load_torch_checkpoint

                logging.info(f"Converting torch checkpoint {ckpt_dir}")
                return jax.tree.map(jnp.asarray, convert_fn(load_torch_checkpoint(ckpt_dir)))
            import orbax.checkpoint as ocp

            logging.info(f"Loading orbax checkpoint {ckpt_dir}")
            ckptr = ocp.StandardCheckpointer()
            abstract = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), *example_inputs))
            restored = ckptr.restore(os.path.abspath(ckpt_dir), abstract)
            # device-resident: numpy leaves would re-upload the full model on
            # EVERY jitted call (60MB/frame through a remote-TPU tunnel)
            return jax.tree.map(jnp.asarray, restored["params"])
        logging.info("No checkpoint found — initializing params from seed")
        return model.init(jax.random.PRNGKey(seed), *example_inputs)["params"]


class PoseRefinePredictor(_PredictorBase):
    """Reference learning/training/predict_pose_refine.py:93-295 equivalent."""

    def __init__(self, cfg: Optional[dict] = None, ckpt_dir: Optional[str] = None,
                 compute_dtype=jnp.bfloat16):
        self.cfg = dict(DEFAULT_REFINER_CFG)
        if cfg:
            self.cfg.update(cfg)
        if (cfg is None or "occ_sub" not in cfg) and ckpt_dir \
                and os.path.exists(os.path.join(ckpt_dir, "OCC_SUB")):
            # checkpoint trained WITH the visibility substitution — inference
            # must match, including the gate ceiling (see _make_AB occ_sub;
            # marker written by tools/train_networks.py)
            with open(os.path.join(ckpt_dir, "OCC_SUB")) as f:
                txt = f.read()
            import re

            m = re.search(r"ceiling=([0-9.]+)", txt)
            self.cfg["occ_sub"] = float(m.group(1)) if m else True
        self.model = RefineNet(
            c_in=self.cfg["c_in"], rot_rep=self.cfg["rot_rep"], dtype=compute_dtype
        )
        hw = tuple(self.cfg["input_resize"])
        dummy = jnp.zeros((1, hw[0], hw[1], self.cfg["c_in"]), dtype=jnp.float32)
        from .torch_convert import convert_refine_net

        self.params = self._init_params(self.model, (dummy, dummy), ckpt_dir, convert_refine_net)
        self.last_trans_update = None
        self.last_rot_update = None

    def predict(self, rgb, depth, K, ob_in_cams, xyz_map, normal_map=None, get_vis=False,
                mesh=None, mesh_tensors: MeshArrays = None, glctx=None, mesh_diameter=None,
                iteration=5, out_hw=None, backface_cull=None):
        """@rgb: (H,W,3) uint8/float; @ob_in_cams: (N,4,4); returns (poses, vis).

        @out_hw: optional crop-resolution override (defaults to the cfg's
        input_resize).  The nets are fully convolutional with token-sliced
        position embeddings, so coarse phases can run at lower resolution
        (quadratically less raster work) — see estimater.py coarse_hw.
        """
        rgb01 = to_rgb01(rgb)
        poses = refine_poses_jit(
            self.model,
            self.params,
            mesh_tensors,
            jnp.asarray(ob_in_cams, dtype=jnp.float32),
            rgb01,
            jnp.asarray(xyz_map, dtype=jnp.float32),
            jnp.asarray(K, dtype=jnp.float32),
            float(mesh_diameter),
            float(self.cfg["crop_ratio"]),
            float(self.cfg["trans_normalizer"]),
            float(self.cfg["rot_normalizer"]),
            iterations=int(iteration),
            out_hw=tuple(out_hw) if out_hw is not None else tuple(self.cfg["input_resize"]),
            normalize_xyz=bool(self.cfg["normalize_xyz"]),
            trans_rep=self.cfg["trans_rep"],
            rot_rep=self.cfg["rot_rep"],
            # per-call override: the flag is per-mesh state, and one predictor
            # may serve several FoundationPose instances (different meshes)
            backface_cull=bool(self.cfg.get("backface_cull", False)
                               if backface_cull is None else backface_cull),
            occ_sub=self.cfg.get("occ_sub", False),  # False | True | ceiling
        )
        vis = None
        if get_vis:
            vis = self._make_vis(mesh_tensors, poses, rgb01, xyz_map, K, mesh_diameter)
        return poses, vis

    def _make_vis(self, mesh_arrays, poses, rgb01, xyz_map, K, mesh_diameter):
        from ..utils.vis import make_grid_image

        A, B, _, _ = _make_AB(
            mesh_arrays, poses, rgb01, jnp.asarray(xyz_map, dtype=jnp.float32),
            jnp.asarray(K, dtype=jnp.float32), float(self.cfg["crop_ratio"]),
            float(mesh_diameter), tuple(self.cfg["input_resize"]),
            bool(self.cfg["normalize_xyz"]), 0.001,
        )
        rows = []
        n = min(16, A.shape[0])
        for i in range(n):
            ra = np.asarray(A[i, ..., :3] * 255).astype(np.uint8)
            rb = np.asarray(B[i, ..., :3] * 255).astype(np.uint8)
            rows.append(make_grid_image([ra, rb], nrow=2))
        return make_grid_image(rows, nrow=1)


class ScorePredictor(_PredictorBase):
    """Reference learning/training/predict_score.py:117-226 equivalent."""

    def __init__(self, cfg: Optional[dict] = None, ckpt_dir: Optional[str] = None,
                 compute_dtype=jnp.bfloat16):
        self.cfg = dict(DEFAULT_SCORER_CFG)
        if cfg:
            self.cfg.update(cfg)
        self.model = ScoreNetMultiPair(c_in=self.cfg["c_in"], dtype=compute_dtype)
        hw = tuple(self.cfg["input_resize"])
        dummy = jnp.zeros((2, hw[0], hw[1], self.cfg["c_in"]), dtype=jnp.float32)
        from .torch_convert import convert_score_net

        self.params = self._init_params(
            self.model, (dummy, dummy, 2), ckpt_dir, convert_score_net
        )

    def predict(self, rgb, depth, K, ob_in_cams, normal_map=None, get_vis=False, mesh=None,
                mesh_tensors: MeshArrays = None, glctx=None, mesh_diameter=None,
                out_hw=None, backface_cull=None):
        rgb01 = to_rgb01(rgb)
        from ..ops.geometry import depth2xyzmap

        xyz_map = depth2xyzmap(jnp.asarray(depth, dtype=jnp.float32),
                               jnp.asarray(K, dtype=jnp.float32))

        def score_fn(poses):
            return score_poses_jit(
                self.model,
                self.params,
                mesh_tensors,
                jnp.asarray(poses, dtype=jnp.float32),
                rgb01,
                xyz_map,
                jnp.asarray(K, dtype=jnp.float32),
                float(mesh_diameter),
                float(self.cfg["crop_ratio"]),
                out_hw=tuple(out_hw) if out_hw is not None else tuple(self.cfg["input_resize"]),
                normalize_xyz=bool(self.cfg["normalize_xyz"]),
                mode=self.cfg.get("score_mode", "network"),
                backface_cull=bool(self.cfg.get("backface_cull", False)
                                   if backface_cull is None else backface_cull),
            )

        max_batch = self.cfg.get("max_batch")
        n = len(ob_in_cams)
        if max_batch is None or n <= max_batch:
            return score_fn(ob_in_cams), None
        # chunks of 1 elect themselves winner forever — never terminates
        return self._tournament(score_fn, np.asarray(ob_in_cams), max(2, int(max_batch))), None

    @staticmethod
    def _tournament(score_fn, poses_np, max_batch):
        """Multi-chunk elimination (reference predict_score.py:182-214 +
        pose_dataset.py:129-134 select_by_indices): each round splits the
        surviving set into max_batch-sized chunks (the last padded by
        repeating its first pose — static shapes for jit), keeps each chunk's
        argmax, and the FINAL round's scores+100 land in the global array.

        Deviation from the reference: eliminated hypotheses keep their
        last-seen chunk logit instead of 0.  The reference's only consumer is
        the final argmax, for which this is identical (+100 dominates and the
        final round's ordering is untouched) — but the staged register path
        also top-K-prunes on these scores (estimater.py), and there a zero
        for every eliminated hypothesis would make the cut arbitrary."""
        n = len(poses_np)
        global_ids = np.arange(n)
        scores_global = np.zeros(n, dtype=np.float32)
        while True:
            m = len(global_ids)
            if m <= max_batch:
                scores = np.asarray(score_fn(poses_np[global_ids]))
                scores_global[global_ids] = scores + 100.0
                return jnp.asarray(scores_global)
            pad = (-m) % max_batch
            # pad the last chunk by repeating the first survivor: duplicates
            # score identically, so a padded winner is still a real pose id
            padded = np.concatenate([global_ids, np.repeat(global_ids[:1], pad)])
            winners = []
            for chunk in padded.reshape(-1, max_batch):
                s = np.asarray(score_fn(poses_np[chunk]))
                scores_global[chunk] = s  # last-seen logits (see docstring)
                winners.append(chunk[int(np.argmax(s))])
            global_ids = np.asarray(winners)
