"""Point-to-plane ICP as a fused XLA program, with batched restarts.

TPU-native replacement for Open3D `registration_icp(
TransformationEstimationPointToPlane)` (reference src/pose_estimation.py:
519-522, :654-660) and the surrounding search loops:

- correspondence search is a chunked brute-force nearest neighbor in the
  ||s||^2+||q||^2-2 s.q matmul form (MXU work, no trees);
- each iteration solves the 6x6 point-to-plane normal equations and composes
  an SE(3) update; iterations run under `lax.scan` with convergence freezing;
- the reference's *sequential* searches — 50 random-restart refinements
  (src/pose_estimation.py:547-622) and the +-50mm z bisection (:624-683) —
  become a single `vmap` over candidate initializations: one device dispatch
  evaluates every restart in parallel.

All shapes are static: source/target clouds arrive padded with masks.
Conventions follow Open3D: `transformation` maps SOURCE into TARGET frame;
fitness = #inliers/#source; inlier_rmse = Euclidean RMSE over inliers.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .lie import so3_exp_map

# All matmuls here carry METRIC positions/residuals; the TPU default (bf16
# passes) costs ~0.4% relative = several mm at 0.5 m scale and was measured
# biasing the track depth polish 7 mm from an exact pose.  Pin full fp32.
_HI = jax.lax.Precision.HIGHEST

_NN_CHUNK = 1024


class ICPResult(NamedTuple):
    transformation: jnp.ndarray  # (4,4) source -> target
    fitness: jnp.ndarray  # scalar
    inlier_rmse: jnp.ndarray  # scalar


def nearest_neighbors(query, ref, ref_mask):
    """For each query point, index+distance of nearest valid ref point.

    @query: (N,3); @ref: (M,3); @ref_mask: (M,) bool.
    Chunked over query rows so the (chunk,M) distance tile stays in VMEM.
    """
    ref_sq = jnp.sum(ref * ref, axis=-1)  # (M,)
    big = jnp.asarray(jnp.inf, dtype=query.dtype)

    def chunk_fn(q):
        # (C,M) squared distances via matmul (MXU)
        d2 = (
            jnp.sum(q * q, axis=-1, keepdims=True)
            + ref_sq[None]
            - 2.0 * jnp.matmul(q, ref.T, precision=_HI)
        )
        d2 = jnp.where(ref_mask[None], d2, big)
        idx = jnp.argmin(d2, axis=-1)
        dmin = jnp.take_along_axis(d2, idx[:, None], axis=-1)[:, 0]
        return idx, jnp.sqrt(jnp.maximum(dmin, 0.0))

    n = query.shape[0]
    if n <= _NN_CHUNK:
        return chunk_fn(query)
    pad = (-n) % _NN_CHUNK
    qp = jnp.pad(query, ((0, pad), (0, 0)))
    qp = qp.reshape(-1, _NN_CHUNK, 3)
    idx, dist = jax.lax.map(chunk_fn, qp)
    return idx.reshape(-1)[:n], dist.reshape(-1)[:n]


def _apply(tf, pts):
    return jnp.matmul(pts, tf[:3, :3].T, precision=_HI) + tf[:3, 3]


def evaluate_registration(src, src_mask, tgt, tgt_mask, tf, max_dist):
    """Open3D evaluate_registration semantics on padded clouds."""
    sp = _apply(tf, src)
    _, dist = nearest_neighbors(sp, tgt, tgt_mask)
    inlier = src_mask & (dist < max_dist)
    n_src = jnp.maximum(jnp.sum(src_mask), 1)
    n_in = jnp.sum(inlier)
    fitness = n_in / n_src
    rmse = jnp.sqrt(jnp.sum(jnp.where(inlier, dist * dist, 0.0)) / jnp.maximum(n_in, 1))
    return fitness, rmse


def icp_point_to_plane(
    src,
    src_mask,
    tgt,
    tgt_normals,
    tgt_mask,
    init_tf,
    max_dist,
    max_iter: int = 30,
    relative_eps: float = 1e-6,
):
    """Point-to-plane ICP (Open3D registration_icp semantics).

    @src: (N,3) padded source points, @src_mask: (N,) validity
    @tgt/(tgt_normals): (M,3) padded target points/unit normals
    @init_tf: (4,4) initial source->target transform
    @max_dist: correspondence distance threshold (may be a traced scalar)
    Returns ICPResult.
    """
    n_src = jnp.maximum(jnp.sum(src_mask), 1)

    def step(carry, _):
        tf, prev_fit, prev_rmse, done = carry
        sp = _apply(tf, src)
        idx, dist = nearest_neighbors(sp, tgt, tgt_mask)
        q = tgt[idx]
        n = tgt_normals[idx]
        w = (src_mask & (dist < max_dist)).astype(src.dtype)  # (N,)

        r = jnp.sum((sp - q) * n, axis=-1)  # (N,) signed plane distance
        J = jnp.concatenate([jnp.cross(sp, n), n], axis=-1)  # (N,6)
        Jw = J * w[:, None]
        A = jnp.matmul(Jw.T, J, precision=_HI)  # (6,6)
        b = jnp.matmul(Jw.T, r, precision=_HI)  # (6,)
        A = A + 1e-8 * jnp.eye(6, dtype=src.dtype)
        x = -jnp.linalg.solve(A, b)
        delta = jnp.eye(4, dtype=src.dtype)
        delta = delta.at[:3, :3].set(so3_exp_map(x[None, :3])[0])
        delta = delta.at[:3, 3].set(x[3:])
        new_tf = jnp.matmul(delta, tf, precision=_HI)

        n_in = jnp.sum(w)
        fitness = n_in / n_src
        rmse = jnp.sqrt(jnp.sum(w * dist * dist) / jnp.maximum(n_in, 1.0))
        converged = (
            (jnp.abs(prev_fit - fitness) < relative_eps)
            & (jnp.abs(prev_rmse - rmse) < relative_eps)
        )
        new_done = done | converged | (n_in < 6)
        tf_out = jnp.where(new_done, tf, new_tf)
        return (tf_out, fitness, rmse, new_done), None

    init = (init_tf.astype(src.dtype), jnp.asarray(0.0, src.dtype), jnp.asarray(0.0, src.dtype), jnp.asarray(False))
    (tf, _, _, _), _ = jax.lax.scan(step, init, None, length=max_iter)
    fitness, rmse = evaluate_registration(src, src_mask, tgt, tgt_mask, tf, max_dist)
    return ICPResult(tf, fitness, rmse)


@functools.partial(jax.jit, static_argnames=("max_iter",))
def icp_batch(src, src_mask, tgt, tgt_normals, tgt_mask, init_tfs, max_dists, max_iter=30):
    """vmapped ICP over K candidate (init_tf, max_dist) pairs.

    Replaces the reference's 50-iteration sequential random-restart loop
    (src/pose_estimation.py:577-613) with one parallel dispatch.
    @init_tfs: (K,4,4); @max_dists: (K,).  Returns batched ICPResult.
    """
    fn = lambda tf, md: icp_point_to_plane(
        src, src_mask, tgt, tgt_normals, tgt_mask, tf, md, max_iter=max_iter
    )
    return jax.vmap(fn)(init_tfs, max_dists)


@functools.partial(jax.jit, static_argnames=())
def icp_one_iter_batch(src, src_mask, tgt, tgt_normals, tgt_mask, init_tfs, max_dist):
    """vmapped 1-iteration ICP evaluation (z-ladder scoring like the
    reference's max_iteration=1 probes)."""
    fn = lambda tf: icp_point_to_plane(
        src, src_mask, tgt, tgt_normals, tgt_mask, tf, max_dist, max_iter=1
    )
    return jax.vmap(fn)(init_tfs)


@functools.partial(jax.jit, static_argnames=("max_iter",))
def icp_batch_with_eval(src, src_mask, tgt, tgt_normals, tgt_mask, init_tfs, max_dists,
                        eval_tf, eval_dist, max_iter=30):
    """icp_batch + a single-transform evaluation in ONE dispatch.

    improve_result needs both the refined restarts and the fitness of the
    unrefined initial transform (reference src/pose_estimation.py:564-569);
    issuing them as separate jitted calls costs an extra host->device round
    trip (~45ms over the remote-TPU tunnel), so they are fused here.
    """
    res = jax.vmap(
        lambda tf, md: icp_point_to_plane(
            src, src_mask, tgt, tgt_normals, tgt_mask, tf, md, max_iter=max_iter
        )
    )(init_tfs, max_dists)
    f0, r0 = evaluate_registration(src, src_mask, tgt, tgt_mask, eval_tf, eval_dist)
    return res, f0, r0


def _improve_and_raytrace_body(src, src_mask, tgt, tgt_normals, tgt_mask, init_tfs,
                               max_dists, eval_tf, eval_dist, mesh_tri, mesh_tri_mask,
                               ray_dirs, ray_mask, inv_color_to_depth, max_iter):
    from .raytrace import ray_mesh_intersect

    res = jax.vmap(
        lambda tf, md: icp_point_to_plane(
            src, src_mask, tgt, tgt_normals, tgt_mask, tf, md, max_iter=max_iter
        )
    )(init_tfs, max_dists)
    f0, r0 = evaluate_registration(src, src_mask, tgt, tgt_mask, eval_tf, eval_dist)

    fit = jnp.concatenate([res.fitness, f0[None]])
    rmse = jnp.concatenate([res.inlier_rmse, r0[None]])
    tf_all = jnp.concatenate([res.transformation, eval_tf[None]])

    valid = (fit > 0) & (rmse > 0)
    any_valid = valid.any()
    # improve_result's np.lexsort((rmse, -fit)) — fitness desc, then rmse asc
    # — done in two exact stages (a combined -fit*BIG+rmse key can invert the
    # order once rmse differences exceed BIG * the 1/N fitness quantum).
    # Every restart shares the same source cloud, so equal inlier counts give
    # bitwise-equal fitness and the == tie test is exact.
    max_fit = jnp.max(jnp.where(valid, fit, -jnp.inf))
    key = jnp.where(valid & (fit == max_fit), rmse, jnp.inf)
    # all-invalid falls back to the appended initial transform
    best = jnp.where(any_valid, jnp.argmin(key), fit.shape[0] - 1)

    best_tf = tf_all[best]  # source->target (scene->object)
    obj_in_scene = jnp.linalg.inv(best_tf)
    M = jnp.matmul(inv_color_to_depth, obj_in_scene, precision=_HI)
    tri_w = jnp.einsum("ij,tkj->tki", M[:3, :3], mesh_tri, precision=_HI) + M[:3, 3]
    origins = jnp.zeros_like(ray_dirs)
    t_hit = ray_mesh_intersect(origins, ray_dirs, ray_mask, tri_w, mesh_tri_mask)
    return tf_all, fit, rmse, best, t_hit


@functools.partial(jax.jit, static_argnames=("max_iter",))
def improve_and_raytrace(src, src_mask, tgt, tgt_normals, tgt_mask, init_tfs, max_dists,
                         eval_tf, eval_dist, mesh_tri, mesh_tri_mask, ray_dirs, ray_mask,
                         inv_color_to_depth, max_iter=30):
    """One capture event as ONE device program: batched-restart ICP + the
    initial-transform evaluation + device-side best-pick + defect ray trace
    against the re-posed mesh.

    The staged path (improve_result -> host argbest -> transform mesh ->
    ray_tracing) pays two extra dispatches and the host round trips between
    them; at capture cadence that latency is the difference between making
    and missing the 10 FPS budget (BASELINE.md).

    @mesh_tri: (T,3,3) model-frame mm triangles; @ray_dirs: (M,3) color-frame
    rays; @inv_color_to_depth: (4,4).  Returns (tf_all (K+1,4,4), fit (K+1,),
    rmse (K+1,), best index (), t_hit (M,)).
    """
    return _improve_and_raytrace_body(
        src, src_mask, tgt, tgt_normals, tgt_mask, init_tfs, max_dists,
        eval_tf, eval_dist, mesh_tri, mesh_tri_mask, ray_dirs, ray_mask,
        inv_color_to_depth, max_iter)


@functools.partial(jax.jit, static_argnames=("it1", "it2", "it3"))
def icp_polish_two_pass(src, src_mask, tgt, tgt_normals, tgt_mask, init_tf,
                        thr1, thr2, thr3=None, it1=10, it2=10, it3=10):
    """Coarse-then-fine point-to-plane polish as ONE dispatch.

    Register's depth polish (estimater.register depth_polish): the learned
    cascade's top pose is refined against the masked observed cloud — a
    wide first pass absorbs the net's ~10-15 deg residual, tighter passes
    lock sub-degree alignment; the caller floors the finest threshold at
    the sensor noise so noise cannot dominate.
    @init_tf: (4,4) source->target.  Returns the refined (4,4).
    """
    r1 = icp_point_to_plane(src, src_mask, tgt, tgt_normals, tgt_mask,
                            init_tf, thr1, max_iter=it1)
    r2 = icp_point_to_plane(src, src_mask, tgt, tgt_normals, tgt_mask,
                            r1.transformation, thr2, max_iter=it2)
    if thr3 is None:
        return r2.transformation
    r3 = icp_point_to_plane(src, src_mask, tgt, tgt_normals, tgt_mask,
                            r2.transformation, thr3, max_iter=it3)
    return r3.transformation


@functools.partial(jax.jit, static_argnames=("max_iter",))
def capture_from_pose(src, src_mask, tgt, tgt_normals, tgt_mask,
                      pose_dev, tf_to_centered, color_to_depth, noise_tfs, max_dists,
                      eval_dist, mesh_tri, mesh_tri_mask, ray_dirs, ray_mask,
                      inv_color_to_depth, max_iter=30):
    """Capture event seeded directly from the DEVICE tracked pose — the
    restart-seed math the host used to do (mm scaling, extrinsic compose,
    inversion, noise application; reference run.py:95-96 + :168-206) moves
    in-graph, so a capture frame never has to synchronize the tracked pose
    to the host before dispatching ICP + ray trace.  Combined with an async
    readback of the result, the capture's device work and its tunnel round
    trip both overlap the next frames' tracking (the app's dead-reckoning
    consumers tolerate a one-frame lag, reference run.py:210).

    @pose_dev: (4,4) tracked pose of the CENTERED mesh, color-cam meters
    (track_pose_jit output); @tf_to_centered: (4,4) centered->original mesh
    compose (FoundationPose.get_tf_to_centered_mesh); @color_to_depth: (4,4)
    mm extrinsic; @noise_tfs: (K,4,4) pose-independent restart noise
    (identity first row = the unperturbed seed).  Other args as
    improve_and_raytrace.  Returns (tf_all, fit, rmse, best, t_hit).
    """
    pose_orig = jnp.matmul(pose_dev.reshape(4, 4), tf_to_centered,
                           precision=_HI)  # original mesh frame
    pose_mm = pose_orig.at[:3, 3].multiply(1000.0)  # meters -> mm (ICP frame)
    cap_tf = jnp.matmul(color_to_depth, pose_mm, precision=_HI)  # object-in-scene, depth cam
    # source->target ICP init: rigid inverse (R^T, -R^T t) — exact for the
    # rigid cap_tf where a general f32 LU inverse loses ~1e-4 relative on a
    # ~500 mm translation
    Rt = cap_tf[:3, :3].T
    eval_tf = jnp.eye(4, dtype=cap_tf.dtype)
    eval_tf = eval_tf.at[:3, :3].set(Rt)
    eval_tf = eval_tf.at[:3, 3].set(-jnp.matmul(Rt, cap_tf[:3, 3], precision=_HI))
    init_tfs = jnp.einsum("kij,jl->kil", noise_tfs, eval_tf, precision=_HI)
    return _improve_and_raytrace_body(
        src, src_mask, tgt, tgt_normals, tgt_mask, init_tfs, max_dists,
        eval_tf, eval_dist, mesh_tri, mesh_tri_mask, ray_dirs, ray_mask,
        inv_color_to_depth, max_iter)
