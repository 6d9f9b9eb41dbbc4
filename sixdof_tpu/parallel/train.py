"""Training: render-and-compare refiner/scorer fitting on synthetic pairs.

The reference ships only a config schema (learning/training/training_config.py
— batch 64, adam lr 1e-4, loss types `pairwise_valid`/`l2`) and downloads its
weights; there is **no training loop in the repo** (SURVEY.md §2.2).  Since
the checkpoints also don't ship, this module provides the full TPU-native
trainer the reference implies:

- **on-the-fly data generation on device**: sample ground-truth poses, apply
  bounded random perturbations (the refiner's trans/rot normalizer ranges),
  render both views with ops/rasterize.py — no H5 datasets or host IO in the
  loop;
- **refiner loss**: L2 on the predicted egocentric deltas vs the true
  perturbation (the `l2` loss type, training_config.py:33);
- **scorer loss**: listwise softmax cross-entropy against an ADD-derived
  target distribution over the hypothesis set (the `pairwise_valid` idea);
- **parallelism**: batch axis sharded over the mesh's `data` axis (DP,
  gradients psum'd by XLA), large kernels optionally TP-sharded over `model`
  (parallel/sharding.py).  The whole step — rendering included — is ONE jit.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.geometry import egocentric_delta_pose_to_pose
from ..ops.lie import so3_exp_map
from ..ops.rasterize import MeshArrays, render_batch
from .sharding import data_sharding, param_shardings, replicated


class TrainConfig(NamedTuple):
    """Mirrors the reference TrainingConfig fields we consume
    (training_config.py:18-101)."""

    batch_size: int = 64
    lr: float = 1e-4
    input_hw: tuple = (160, 160)
    trans_normalizer: float = 0.02
    rot_normalizer: float = 0.3490658503988659
    n_hypotheses: int = 8  # per scene, scorer
    z_range: tuple = (0.4, 0.8)
    # probability a B crop gets a random foreground occluder (see
    # _crop_occluder: real scenes occlude; unoccluded-only pairs diverge)
    p_occlusion: float = 0.5
    # probability a B crop gets the in-graph sensor degradation
    # (parallel/augment.py — the same family as the eval track's
    # tools/sensor_model.py; clean-only pairs never see real-sensor artifacts)
    p_sensor: float = 0.0
    sensor_strength: float = 1.0
    # train with the inference-time visibility substitution (predict.py::
    # _make_AB occ_sub): pixels where B is >1 cm nearer than A's render get
    # A's values, so occluders carry zero residual.  MUST match inference —
    # a net trained with occluders visible diverges on substituted inputs
    # (measured: clutter 5-deg basin 11 deg -> 44 deg) and vice versa.
    occ_sub: object = False  # False | True (0.6 ceiling) | float gate ceiling
    # scorer only: weight of the listwise distillation term against the
    # analytic depth/color teacher (predict.py::_depth_alignment_score).
    # The teacher is a computable function of the net's own (A, B) inputs —
    # imitating a realizable feature extractor is far better conditioned
    # than discovering texture-flip discrimination from sparse ADD labels
    # (six r3 campaigns failed at the latter; PROGRESS_NOTES ablation table).
    w_distill: float = 0.0


def _random_poses(key, n, z_range):
    """Random object-in-camera poses: uniform rotations + z in range."""
    k1, k2, k3 = jax.random.split(key, 3)
    w = jax.random.normal(k1, (n, 3)) * 2.0
    R = so3_exp_map(w)
    z = jax.random.uniform(k2, (n,), minval=z_range[0], maxval=z_range[1])
    xy = jax.random.uniform(k3, (n, 2), minval=-0.03, maxval=0.03)
    poses = jnp.tile(jnp.eye(4)[None], (n, 1, 1))
    poses = poses.at[:, :3, :3].set(R)
    poses = poses.at[:, :3, 3].set(jnp.concatenate([xy, z[:, None]], axis=-1))
    return poses.astype(jnp.float32)


def _perturb(key, poses, trans_amp, rot_amp):
    """Bounded egocentric perturbation; returns (poses_pert, dt, dR)."""
    k1, k2 = jax.random.split(key)
    n = poses.shape[0]
    dt = jax.random.uniform(k1, (n, 3), minval=-trans_amp, maxval=trans_amp)
    dw = jax.random.uniform(k2, (n, 3), minval=-rot_amp, maxval=rot_amp)
    dR = so3_exp_map(dw)
    return egocentric_delta_pose_to_pose(poses, dt, dR), dt, dw


def _crop_background(key, tf_to_crops, K, z_obj, out_hw):
    """Synthetic 'scene' behind the object for the B (real-image) crop.

    At inference the real crop contains the table/background with VALID rgb
    and xyz; pairs trained on empty backgrounds do not transfer.  Builds a
    plane at a random depth behind the object (correct per-pixel backprojected
    xyz) with a random low-frequency color texture.
    Returns (rgb_bg (B,H,W,3), xyz_bg (B,H,W,3)).
    """
    H, W = out_hw
    Bn = tf_to_crops.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    zbg = z_obj + jax.random.uniform(k1, (Bn,), minval=0.03, maxval=0.25)  # (B,)

    # crop pixel -> full-image pixel -> camera ray -> xyz at plane depth
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    grid = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)  # (H,W,3)
    inv = jnp.linalg.inv(tf_to_crops)  # (B,3,3)
    full = jnp.einsum("bij,hwj->bhwi", inv, grid)
    u = full[..., 0] / full[..., 2]
    v = full[..., 1] / full[..., 2]
    dirx = (u - K[0, 2]) / K[0, 0]
    diry = (v - K[1, 2]) / K[1, 1]
    z = zbg[:, None, None]
    xyz_bg = jnp.stack([dirx * z, diry * z, jnp.broadcast_to(z, dirx.shape)], axis=-1)

    base = jax.random.uniform(k2, (Bn, 1, 1, 3), minval=0.05, maxval=0.9)
    coarse = jax.random.uniform(k3, (Bn, 8, 8, 3), minval=-0.25, maxval=0.25)
    tex = jax.image.resize(coarse, (Bn, H, W, 3), method="linear")
    rgb_bg = jnp.clip(base + tex, 0.0, 1.0)
    return rgb_bg, xyz_bg


def _crop_occluder(key, tf_to_crops, K, z_obj, out_hw, p_occ=0.5, z_off=(0.05, 0.25)):
    """Random foreground occluder for the B (real-image) crop.

    The clutter/occlusion scenes showed the refiner diverging (5-deg
    perturbations -> ~60 deg) on partially-occluded objects even when the
    object was IN the training set: unoccluded pairs teach the net to treat
    every object pixel as visible, and a ~25%-occluded real crop pulls the
    translation toward the visible fragment.  This composites a random
    ellipse at a depth IN FRONT of the object (own texture, correct
    backprojected xyz) over ~p_occ of the samples.
    Returns (occ (B,H,W,1) bool, rgb_occ, xyz_occ).
    """
    H, W = out_hw
    Bn = tf_to_crops.shape[0]
    kz, kc, kr, ka, kg, kt = jax.random.split(key, 6)
    zocc = jnp.maximum(
        z_obj - jax.random.uniform(kz, (Bn,), minval=z_off[0], maxval=z_off[1]), 0.08)

    c = jax.random.uniform(kc, (Bn, 2, 1, 1), minval=0.1, maxval=0.9)
    cx, cy = c[:, 0] * W, c[:, 1] * H
    r = jax.random.uniform(kr, (Bn, 2, 1, 1), minval=0.08, maxval=0.3)
    rx, ry = r[:, 0] * W, r[:, 1] * H
    ang = jax.random.uniform(ka, (Bn, 1, 1), minval=0.0, maxval=jnp.pi)
    gate = jax.random.bernoulli(kg, p_occ, (Bn, 1, 1))

    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    dx = xs - cx
    dy = ys - cy
    xr = dx * jnp.cos(ang) + dy * jnp.sin(ang)
    yr = -dx * jnp.sin(ang) + dy * jnp.cos(ang)
    occ = (((xr / rx) ** 2 + (yr / ry) ** 2) < 1.0) & gate  # (B,H,W)

    # crop pixel -> full-image ray -> xyz at the occluder depth (same math
    # as _crop_background, nearer plane)
    gx, gy = jnp.meshgrid(xs[0, 0], ys[0, :, 0])
    grid = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)
    inv = jnp.linalg.inv(tf_to_crops)
    full = jnp.einsum("bij,hwj->bhwi", inv, grid)
    u = full[..., 0] / full[..., 2]
    v = full[..., 1] / full[..., 2]
    z = zocc[:, None, None]
    xyz_occ = jnp.stack(
        [(u - K[0, 2]) / K[0, 0] * z, (v - K[1, 2]) / K[1, 1] * z,
         jnp.broadcast_to(z, u.shape)], axis=-1)

    kb, kf = jax.random.split(kt)
    base = jax.random.uniform(kb, (Bn, 1, 1, 3), minval=0.05, maxval=0.9)
    fine = jax.random.uniform(kf, (Bn, 16, 16, 3), minval=-0.3, maxval=0.3)
    rgb_occ = jnp.clip(base + jax.image.resize(fine, (Bn, H, W, 3), method="linear"),
                       0.0, 1.0)
    return occ[..., None], rgb_occ, xyz_occ


def _apply_occluder(key, tf_to_crops, K, z_obj, out_hw, rgbB, xyzB, p_occ=0.5):
    """Z-composite random scene clutter over B and erode depth boundaries.

    Two independent ellipses per sample: a near-front OCCLUDER (always wins
    the z-test over the object) and a DISTRACTOR at roughly object depth
    (wins only where it is nearer than the current surface — real clutter
    sits beside/behind the object as often as in front of it)."""
    k1, k2 = jax.random.split(key)
    for kk, z_off, p in ((k1, (0.05, 0.25), p_occ), (k2, (-0.15, 0.05), p_occ)):
        occ, rgb_occ, xyz_occ = _crop_occluder(kk, tf_to_crops, K, z_obj, out_hw, p, z_off)
        # current per-pixel depth; invalid (xyz=0) pixels lose the z-test so
        # clutter paints over invalidated background
        zB = jnp.where(jnp.abs(xyzB[..., 2:3]) > 1e-6, xyzB[..., 2:3], jnp.inf)
        win = occ & (xyz_occ[..., 2:3] < zB)
        rgbB = jnp.where(win, rgb_occ, rgbB)
        xyzB = jnp.where(win, xyz_occ, xyzB)
        # erode_depth invalidates the depth-discontinuity ring at the
        # occluder boundary exactly like the object silhouette
        xyzB = _erode_edges(win.astype(jnp.float32), xyzB, jnp.zeros_like(xyzB))
    return rgbB, xyzB


def _erode_edges(alpha, xyz, fill, r=2):
    """Simulate erode_depth's boundary invalidation: pixels within r of the
    object silhouette lose their depth at inference (ops/depth_filter.py), so
    the training xyz maps should show the same invalid ring."""
    import jax.lax as lax

    a = alpha[..., 0]
    amax = lax.reduce_window(a, -jnp.inf, lax.max, (1, 2 * r + 1, 2 * r + 1), (1, 1, 1), "SAME")
    amin = lax.reduce_window(a, jnp.inf, lax.min, (1, 2 * r + 1, 2 * r + 1), (1, 1, 1), "SAME")
    edge = (amax > 0.5) & (amin < 0.5)
    return jnp.where(edge[..., None], fill, xyz)


def make_refiner_batch(key, mesh: MeshArrays, K, mesh_diameter, cfg: TrainConfig):
    """Device-side synthetic (A,B,targets) batch for the refiner.

    B = render at the TRUE pose composited over a synthetic background +
    sensor depth noise (standing in for the real image); A = render at the
    PERTURBED pose; the net must predict the egocentric delta that maps A's
    pose onto B's.
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    gt = _random_poses(k1, cfg.batch_size, cfg.z_range)
    # rotation perturbations beyond the normalizer (targets clip to +-1):
    # the net learns saturated-direction corrections for the large initial
    # errors of the 30-deg rotation grid, which iterations then walk down
    pert, dt, dw = _perturb(k2, gt, cfg.trans_normalizer * 0.9, cfg.rot_normalizer * 1.2)

    # render the "real" full frame once per sample is wasteful; instead render
    # B directly in A's crop window (exactly the information the net sees)
    from ..ops.geometry import compute_crop_window_tf_batch

    tf_to_crops = compute_crop_window_tf_batch(
        pert, K, crop_ratio=1.2, out_size=(cfg.input_hw[1], cfg.input_hw[0]),
        mesh_diameter=mesh_diameter,
    )
    rendA = render_batch(mesh, pert, K, tf_to_crops, out_hw=cfg.input_hw, use_light=True)
    rendB = render_batch(mesh, gt, K, tf_to_crops, out_hw=cfg.input_hw, use_light=True)
    center = pert[:, :3, 3][:, None, None, :]

    # per-sample object z (a batch-mean plane can land IN FRONT of far
    # samples, i.e. physically impossible "backgrounds")
    rgb_bg, xyz_bg = _crop_background(k3, tf_to_crops, K, gt[:, 2, 3], cfg.input_hw)
    aB = rendB["alpha"][..., None]
    noise = jax.random.normal(k4, rendB["xyz_map"].shape[:-1] + (1,)) * 0.0015
    xyzB = rendB["xyz_map"] + noise * jnp.asarray([0.0, 0.0, 1.0])
    rgbB = jnp.where(aB > 0, rendB["color"], rgb_bg)
    xyzB = jnp.where(aB > 0, xyzB, xyz_bg)
    xyzB = _erode_edges(aB, xyzB, jnp.zeros_like(xyzB))
    if cfg.p_occlusion > 0:
        kocc = jax.random.fold_in(k4, 1)
        rgbB, xyzB = _apply_occluder(kocc, tf_to_crops, K, gt[:, 2, 3],
                                     cfg.input_hw, rgbB, xyzB, cfg.p_occlusion)
    if cfg.p_sensor > 0:
        from .augment import maybe_degrade_pair

        rgbB, xyzB = maybe_degrade_pair(jax.random.fold_in(k4, 2), rgbB, xyzB,
                                        cfg.p_sensor, cfg.sensor_strength)

    A = jnp.concatenate([rendA["color"], rendA["xyz_map"] - center], axis=-1)
    B = jnp.concatenate([rgbB, xyzB - center], axis=-1)
    if cfg.occ_sub:
        # identical rule to predict.py::_make_AB(occ_sub=...): the net must
        # see at train time exactly what inference will feed it, including
        # the gate ceiling (True = legacy 0.6, float = explicit ceiling)
        hi = 0.6 if cfg.occ_sub is True else float(cfg.occ_sub)
        zA = rendA["xyz_map"][..., 2]
        zB = xyzB[..., 2]
        both = (zA > 0.001) & (zB > 0.001)
        occ = both & (zB < zA - 0.01)
        frac = occ.sum(axis=(1, 2)) / jnp.maximum(both.sum(axis=(1, 2)), 1)
        gate = (frac > 0.02) & (frac < hi)
        B = jnp.where((occ & gate[:, None, None])[..., None], A, B)
    # targets: egocentric deltas mapping pert -> gt.  The predictor decodes
    # R_corr = exp(tanh(rot)*norm)^T = exp(-tanh(rot)*norm), and the needed
    # correction is R_gt R_pert^T = exp(dw)^T = exp(-dw) -> the pre-transpose
    # axis-angle target is +dw.
    target_dt = gt[:, :3, 3] - pert[:, :3, 3]
    target_dw = dw
    return A, B, target_dt, target_dw


def refiner_loss(model, params, A, B, target_dt, target_dw, cfg: TrainConfig):
    """L2 in the network's normalized pre-scale output space (both targets lie
    in (-1,1) by construction, so gradients are well-conditioned)."""
    out = model.apply({"params": params}, A, B)
    t_target = jnp.clip(target_dt / cfg.trans_normalizer, -0.999, 0.999)
    r_target = jnp.clip(target_dw / cfg.rot_normalizer, -0.999, 0.999)
    trans_loss = jnp.mean(jnp.sum((jnp.tanh(out["trans"]) - t_target) ** 2, axis=-1))
    rot_loss = jnp.mean(jnp.sum((jnp.tanh(out["rot"]) - r_target) ** 2, axis=-1))
    return trans_loss + rot_loss


def make_scorer_batch(key, mesh: MeshArrays, K, mesh_diameter, cfg: TrainConfig,
                      n_scenes: int = 4):
    """n_scenes x L hypotheses around GT poses + ADD-derived score targets.

    All scenes' hypotheses render in ONE flat raster call (a vmap over
    per-scene renders nests control flow too deeply for the compiler).
    Returns A,B (n_scenes*L, H, W, 6) and target (n_scenes, L)."""
    from ..ops.geometry import compute_crop_window_tf_batch

    L = cfg.n_hypotheses
    N = n_scenes * L
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    gt = _random_poses(k1, n_scenes, cfg.z_range)  # (ns,4,4)
    gt = jnp.repeat(gt, L, axis=0)  # (ns*L,4,4)
    # graded perturbations: hypothesis 0 of each scene near-perfect; the top
    # HALF of each scene's ladder gets unrestricted rotations so the scorer
    # learns to reject flipped-but-shape-aligned hypotheses (near-symmetric
    # objects confuse pure depth alignment)
    scale = jnp.tile(jnp.linspace(0.0, 1.0, L), n_scenes)  # (ns*L,)
    dt = jax.random.uniform(k2, (N, 3), minval=-1, maxval=1) * (
        scale[:, None] * mesh_diameter * 0.3
    )
    rot_amp = jnp.where(scale > 0.5, jnp.pi, 0.6 * scale)
    dw = jax.random.uniform(k3, (N, 3), minval=-1, maxval=1) * rot_amp[:, None]
    # hard negatives: random big rotations almost never land on the EXACT
    # 180-deg flip — the single hardest case at inference (a flipped render
    # matches the silhouette and depth; only texture disagrees).  Force the
    # two rungs just past mid-ladder to be exact pi flips about a random
    # in-image-plane axis with only small residual noise.
    is_flip = (scale > 0.5) & (scale <= 0.5 + 2.0 / jnp.maximum(L - 1, 1))
    ang = jax.random.uniform(k4, (N,), minval=0.0, maxval=2 * jnp.pi)
    flip_axis = jnp.stack([jnp.cos(ang), jnp.sin(ang), jnp.zeros_like(ang)], axis=-1)
    flip_w = flip_axis * jnp.pi + 0.05 * dw
    dw = jnp.where(is_flip[:, None], flip_w, dw)
    hyp = egocentric_delta_pose_to_pose(gt, dt, so3_exp_map(dw))

    tf_to_crops = compute_crop_window_tf_batch(
        hyp, K, crop_ratio=1.2, out_size=(cfg.input_hw[1], cfg.input_hw[0]),
        mesh_diameter=mesh_diameter,
    )
    rendA = render_batch(mesh, hyp, K, tf_to_crops, out_hw=cfg.input_hw, use_light=True)
    rendB = render_batch(mesh, gt, K, tf_to_crops, out_hw=cfg.input_hw, use_light=True)
    center = hyp[:, :3, 3][:, None, None, :]
    # k3 is already consumed by dw above — reusing it for the background
    # stream would correlate rotation noise with background texture
    kbg, knz = jax.random.split(k5)
    rgb_bg, xyz_bg = _crop_background(kbg, tf_to_crops, K, gt[:, 2, 3], cfg.input_hw)
    aB = rendB["alpha"][..., None]
    noise = jax.random.normal(knz, rendB["xyz_map"].shape[:-1] + (1,)) * 0.0015
    xyzB = rendB["xyz_map"] + noise * jnp.asarray([0.0, 0.0, 1.0])
    rgbB = jnp.where(aB > 0, rendB["color"], rgb_bg)
    xyzB = jnp.where(aB > 0, xyzB, xyz_bg)
    xyzB = _erode_edges(aB, xyzB, jnp.zeros_like(xyzB))
    if cfg.p_occlusion > 0:
        kocc = jax.random.fold_in(knz, 1)
        rgbB, xyzB = _apply_occluder(kocc, tf_to_crops, K, gt[:, 2, 3],
                                     cfg.input_hw, rgbB, xyzB, cfg.p_occlusion)
    if cfg.p_sensor > 0:
        from .augment import maybe_degrade_pair

        rgbB, xyzB = maybe_degrade_pair(jax.random.fold_in(knz, 2), rgbB, xyzB,
                                        cfg.p_sensor, cfg.sensor_strength)
    A = jnp.concatenate([rendA["color"], rendA["xyz_map"] - center], axis=-1)
    B = jnp.concatenate([rgbB, xyzB - center], axis=-1)
    # ADD proxy: mean vertex displacement between hypothesis and gt
    vh = jnp.einsum("lij,vj->lvi", hyp[:, :3, :3], mesh.pos) + hyp[:, None, :3, 3]
    vg = jnp.einsum("lij,vj->lvi", gt[:, :3, :3], mesh.pos) + gt[:, None, :3, 3]
    add = jnp.linalg.norm(vh - vg, axis=-1).mean(axis=-1)  # (ns*L,)
    target = (-add / (0.1 * mesh_diameter)).reshape(n_scenes, L)

    # analytic teacher on the SAME degraded observations the net sees
    # (occluder + sensor artifacts included): occlusion-aware depth support
    # + color agreement on supporting pixels — the hybrid scorer's analytic
    # term (predict.py::_depth_alignment_score), listwise per scene
    from ..models.predict import _depth_alignment_score

    rend_t = {
        "alpha": rendA["alpha"],
        "xyzA_m": rendA["xyz_map"] - center,
        "xyzB_m": xyzB - center,
        "obs_validB": xyzB[..., 2] > 0.1,
    }
    teacher = _depth_alignment_score(A, B, rend_t, hyp, mesh_diameter)
    teacher = teacher.reshape(n_scenes, L)
    return A, B, target, teacher


def _self_biased_cross_attention_init(params):
    """Break the uniform-attention symmetry in the scorer's cross-hypothesis
    attention for FROM-SCRATCH training.

    The reference's att_cross (score_network.py:54,86-88) has no residual:
    with independent random W_q/W_k, attention over the L hypotheses starts
    near-uniform, so every hypothesis receives the same value-average and the
    score head's input carries ~1% per-hypothesis signal — from-scratch
    training never escapes (logits stay constant; the reference escaped with
    orders more data).  Setting W_k := W_q at init makes each hypothesis's
    self-similarity |q|^2 dominate, so attention starts self-focused and
    per-hypothesis identity flows to the head from step 0.  Init-only:
    converted reference checkpoints are untouched and the forward math is
    exactly the reference's.
    """
    import copy as _copy

    if "att_cross" not in params:
        return params
    params = dict(params)
    ac = _copy.deepcopy(dict(params["att_cross"]))
    kern = np.array(ac["in_proj"]["kernel"])  # writable copy
    D = kern.shape[0]
    kern[:, D : 2 * D] = kern[:, :D]  # W_k := W_q
    ac["in_proj"] = dict(ac["in_proj"])
    ac["in_proj"]["kernel"] = jnp.asarray(kern)
    params["att_cross"] = ac
    return params


def scorer_loss(model, params, A, B, target, teacher=None, w_distill=0.0):
    """Listwise ranking CE + direct regression on the ADD proxy
    (+ optional analytic-teacher distillation).

    The regression term provides per-hypothesis gradient signal even while
    the logits are still nearly identical (early training), where softmax CE
    alone is ~flat; @target: (n_scenes, L) = -ADD/(0.1*diameter).
    @teacher: (n_scenes, L) analytic depth/color scores; the distillation
    term is listwise CE against softmax(teacher * T) — T=10 sharpens the
    O(0.1-1) analytic margins into a peaked distribution without collapsing
    ties (VERDICT r3 item 3: distill what the net cannot discover)."""
    ns, L = target.shape
    out = model.apply({"params": params}, A, B, L=L)
    logits = out["score_logit"].reshape(ns, L)
    ce = -jnp.mean(jnp.sum(jax.nn.softmax(target) * jax.nn.log_softmax(logits), axis=-1))
    reg = jnp.mean((logits - target) ** 2)
    loss = ce + 0.3 * reg
    if teacher is not None and w_distill > 0:
        soft = jax.nn.softmax(jax.lax.stop_gradient(teacher) * 10.0)
        kd = -jnp.mean(jnp.sum(soft * jax.nn.log_softmax(logits), axis=-1))
        loss = loss + w_distill * kd
    return loss


_TX_CACHE = {}


def _shared_adam(lr):
    """One optax.adam instance per lr: the jitted step functions below take
    tx as a static argument, so trainer instances must share the SAME
    GradientTransformation object to share a compile."""
    if lr not in _TX_CACHE:
        _TX_CACHE[lr] = optax.adam(lr)
    return _TX_CACHE[lr]


@functools.partial(
    jax.jit,
    static_argnames=("model", "cfg", "tx", "device_mesh"),
    donate_argnums=(0, 1),
)
def _refiner_step(params, opt_state, key, mesh_arrays, K, diam, *, model, cfg, tx,
                  device_mesh=None):
    """Module-level jitted step with the MESH DATA as traced arguments: all
    trainers whose meshes share a topology (same vertex/face counts, both
    textured or both vertex-colored) share ONE compiled program — the
    prerequisite for round-robin training over many procedural objects
    (N objects, 1 compile) instead of N closure-captured recompiles."""
    A, B, tdt, tdw = make_refiner_batch(key, mesh_arrays, K, diam, cfg)
    if device_mesh is not None:
        sh = data_sharding(device_mesh)
        A = jax.lax.with_sharding_constraint(A, sh)
        B = jax.lax.with_sharding_constraint(B, sh)

    def loss_fn(p):
        return refiner_loss(model, p, A, B, tdt, tdw, cfg)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


@functools.partial(
    jax.jit,
    static_argnames=("model", "cfg", "tx", "device_mesh"),
    donate_argnums=(0, 1),
)
def _scorer_step(params, opt_state, key, mesh_arrays, K, diam, *, model, cfg, tx,
                 device_mesh=None):
    A, B, target, teacher = make_scorer_batch(key, mesh_arrays, K, diam, cfg, n_scenes=4)
    if device_mesh is not None:
        sh = data_sharding(device_mesh)
        A = jax.lax.with_sharding_constraint(A, sh)
        B = jax.lax.with_sharding_constraint(B, sh)

    def loss_fn(p):
        return scorer_loss(model, p, A, B, target, teacher, cfg.w_distill)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


class RefinerTrainer:
    """DP/TP-sharded training loop for the refiner."""

    def __init__(self, model, mesh_arrays: MeshArrays, K, mesh_diameter,
                 cfg: TrainConfig = TrainConfig(), device_mesh=None, params=None,
                 tx=None):
        self.model = model
        self.mesh_arrays = mesh_arrays
        self.K = jnp.asarray(K, dtype=jnp.float32)
        self.mesh_diameter = float(mesh_diameter)
        self.cfg = cfg
        self.device_mesh = device_mesh
        self.tx = tx if tx is not None else _shared_adam(cfg.lr)
        if params is None:
            dummy = jnp.zeros((1, *cfg.input_hw, 6), dtype=jnp.float32)
            params = model.init(jax.random.PRNGKey(0), dummy, dummy)["params"]
        self.params = params
        self.opt_state = self.tx.init(self.params)

        if device_mesh is not None:
            p_shard = param_shardings(self.params, device_mesh)
            self.params = jax.tree.map(jax.device_put, self.params, p_shard)
            rep = replicated(device_mesh)
            self.opt_state = jax.device_put(self.opt_state, rep)

    def _step(self, params, opt_state, key):
        return _refiner_step(
            params, opt_state, key, self.mesh_arrays, self.K,
            jnp.float32(self.mesh_diameter), model=self.model, cfg=self.cfg,
            tx=self.tx, device_mesh=self.device_mesh,
        )

    def train(self, n_steps, key=None, log_every=10):
        import logging

        key = key if key is not None else jax.random.PRNGKey(0)
        losses = []
        for i in range(n_steps):
            key, sub = jax.random.split(key)
            self.params, self.opt_state, loss = self._step(self.params, self.opt_state, sub)
            losses.append(float(loss))
            if log_every and i % log_every == 0:
                logging.info(f"refiner step {i}: loss {losses[-1]:.5f}")
        return losses


class ScorerTrainer:
    """Listwise hypothesis-ranking trainer for the scorer."""

    def __init__(self, model, mesh_arrays: MeshArrays, K, mesh_diameter,
                 cfg: TrainConfig = TrainConfig(), device_mesh=None, params=None,
                 tx=None):
        self.model = model
        self.cfg = cfg
        self.tx = tx if tx is not None else _shared_adam(cfg.lr)
        if params is None:
            dummy = jnp.zeros((cfg.n_hypotheses, *cfg.input_hw, 6), dtype=jnp.float32)
            params = model.init(jax.random.PRNGKey(0), dummy, dummy, cfg.n_hypotheses)["params"]
            params = _self_biased_cross_attention_init(params)
        self.params = params
        self.opt_state = self.tx.init(self.params)
        self.mesh_arrays = mesh_arrays
        self.K = jnp.asarray(K, dtype=jnp.float32)
        self.mesh_diameter = float(mesh_diameter)
        self.device_mesh = device_mesh

        if device_mesh is not None:  # same placement as RefinerTrainer
            p_shard = param_shardings(self.params, device_mesh)
            self.params = jax.tree.map(jax.device_put, self.params, p_shard)
            self.opt_state = jax.device_put(self.opt_state, replicated(device_mesh))

    def _step(self, params, opt_state, key):
        return _scorer_step(
            params, opt_state, key, self.mesh_arrays, self.K,
            jnp.float32(self.mesh_diameter), model=self.model, cfg=self.cfg,
            tx=self.tx, device_mesh=self.device_mesh,
        )

    def train(self, n_steps, key=None, log_every=10):
        import logging

        key = key if key is not None else jax.random.PRNGKey(0)
        losses = []
        for i in range(n_steps):
            key, sub = jax.random.split(key)
            self.params, self.opt_state, loss = self._step(self.params, self.opt_state, sub)
            losses.append(float(loss))
            if log_every and i % log_every == 0:
                logging.info(f"scorer step {i}: loss {losses[-1]:.5f}")
        return losses


def save_params(path, params):
    """Crash-safe checkpoint save: write to a temp sibling, then atomically
    swap it over any existing checkpoint.  The old delete-then-write order
    destroyed the previous checkpoint if the process died mid-save — exactly
    the link-weather scenario periodic checkpointing exists to survive
    (ObjectFieldRunner.train saves into the same dir every 250 steps)."""
    import os
    import shutil

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    tmp = path + ".tmp-save"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(tmp, {"params": jax.tree.map(np.asarray, params)})
    ckptr.wait_until_finished()
    # New checkpoint is fully on disk — now retire the old one and rename.
    old = path + ".old-save"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)
