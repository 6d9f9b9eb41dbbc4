"""Point-cloud preprocessing: downsampling, normals, plane RANSAC, clustering.

Replaces the reference's Open3D preprocessing stack
(reference src/pose_estimation.py:141-464): voxel/random downsample, k-NN PCA
normal estimation, RANSAC plane segmentation, DBSCAN largest-cluster filter,
statistical outlier removal, and KD-radius background removal.

These run on the host once per frame over modest point counts (the hot ICP
iterations are device code in ops/icp.py); scipy.cKDTree provides the
neighbor queries (the reference itself uses cKDTree for ADD-S, Utils.py:250).
"""
from __future__ import annotations

import logging

import numpy as np
from scipy.spatial import cKDTree

from ..io.mesh_io import PointCloud


def voxel_down_sample(pcd: PointCloud, voxel_size: float) -> PointCloud:
    """Average points (and colors/normals) per voxel — Open3D semantics."""
    pts = pcd.points
    if len(pts) == 0:
        return pcd.copy()
    coords = np.floor(pts / voxel_size).astype(np.int64)
    # single scalar key per voxel: np.unique(axis=0) does a structured-dtype
    # lexsort that costs ~200ms at 60k points; the flat int64 sort is ~5ms
    cmin = coords.min(axis=0)
    coords -= cmin
    dims = coords.max(axis=0) + 1
    key = (coords[:, 0] * dims[1] + coords[:, 1]) * dims[2] + coords[:, 2]
    _, inverse, counts = np.unique(key, return_inverse=True, return_counts=True)
    n_vox = counts.shape[0]

    def reduce_mean(arr):
        out = np.zeros((n_vox, arr.shape[1]), dtype=np.float64)
        np.add.at(out, inverse, arr)
        return out / counts[:, None]

    out_pts = reduce_mean(pts)
    out_colors = reduce_mean(pcd.colors) if pcd.colors is not None else None
    out_normals = None
    if pcd.normals is not None:
        out_normals = reduce_mean(pcd.normals)
        norm = np.linalg.norm(out_normals, axis=1, keepdims=True)
        out_normals = out_normals / np.clip(norm, 1e-12, None)
    return PointCloud(out_pts, colors=out_colors, normals=out_normals)


def random_down_sample(pcd: PointCloud, max_points: int, seed=0) -> PointCloud:
    """Cap to max_points by uniform choice (preprocess_target semantics,
    reference src/pose_estimation.py:159-172)."""
    if len(pcd) <= max_points:
        return pcd
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(pcd), max_points, replace=False)
    return PointCloud(
        pcd.points[idx],
        None if pcd.colors is None else pcd.colors[idx],
        None if pcd.normals is None else pcd.normals[idx],
    )


def estimate_normals(pcd: PointCloud, radius=2.0, max_nn=5) -> PointCloud:
    """Hybrid radius/k-NN PCA normals (Open3D KDTreeSearchParamHybrid
    semantics; defaults match reference src/pose_estimation.py:301-306)."""
    pts = pcd.points
    tree = cKDTree(pts)
    dists, idx = tree.query(pts, k=min(max_nn, len(pts)), workers=-1)
    if dists.ndim == 1:
        dists, idx = dists[:, None], idx[:, None]
    valid = dists <= radius
    # always include self
    valid[:, 0] = True
    normals = np.zeros_like(pts)
    nbr = pts[idx]  # (N,k,3)
    w = valid[..., None].astype(np.float64)
    cnt = w.sum(axis=1)
    mean = (nbr * w).sum(axis=1) / np.clip(cnt, 1, None)
    d = (nbr - mean[:, None]) * w
    cov = np.einsum("nki,nkj->nij", d, d)
    # smallest-eigenvector per point
    eigval, eigvec = np.linalg.eigh(cov)
    normals = eigvec[:, :, 0]
    # orient towards camera (Open3D default leaves orientation arbitrary;
    # we orient normals to face the origin, the camera position)
    flip = np.einsum("ni,ni->n", normals, pts) > 0
    normals[flip] *= -1
    pcd.normals = normals
    return pcd


def segment_plane(pcd: PointCloud, distance_threshold, ransac_n=3, num_iterations=100, seed=0):
    """RANSAC plane fit; returns (plane_model [a,b,c,d], inlier_indices).

    Mirrors Open3D segment_plane as used by perform_plane_segmentation
    (reference src/pose_estimation.py:323-329).  Vectorized over trials.
    """
    pts = pcd.points
    n = len(pts)
    rng = np.random.RandomState(seed)
    tri = rng.randint(0, n, size=(num_iterations, 3))
    p0, p1, p2 = pts[tri[:, 0]], pts[tri[:, 1]], pts[tri[:, 2]]
    normal = np.cross(p1 - p0, p2 - p0)
    norm = np.linalg.norm(normal, axis=1, keepdims=True)
    ok = norm[:, 0] > 1e-12
    normal = normal / np.clip(norm, 1e-12, None)
    d = -np.einsum("ij,ij->i", normal, p0)
    # inlier counts for ALL trials in one (N, trials) pass — a python loop
    # over trials costs ~30ms at 19k points, the matmul form ~5ms
    dist = np.abs(pts @ normal.T + d[None, :])  # (N, trials)
    cnt = (dist < distance_threshold).sum(axis=0)
    cnt[~ok] = -1
    best = int(np.argmax(cnt))
    plane = np.array([*normal[best], d[best]])
    inliers = np.where(np.abs(pts @ normal[best] + d[best]) < distance_threshold)[0]
    # least-squares refit on inliers (Open3D refines the plane)
    q = pts[inliers] - pts[inliers].mean(axis=0)
    _, _, vh = np.linalg.svd(q, full_matrices=False)
    nrm = vh[-1]
    if np.dot(nrm, plane[:3]) < 0:
        nrm = -nrm
    dd = -np.dot(nrm, pts[inliers].mean(axis=0))
    return np.array([*nrm, dd]), inliers


def compute_average_normal(pcd: PointCloud, voxel=10.0):
    """Mean unit normal over a voxel-downsampled copy
    (reference src/pose_estimation.py:314-321)."""
    down = voxel_down_sample(pcd, voxel) if len(pcd) else pcd
    if down.normals is None:
        down = estimate_normals(down)
    avg = down.normals.mean(axis=0)
    return avg / np.linalg.norm(avg)


def flip_plane_normal_if_needed(plane_model, average_normal):
    """(reference src/pose_estimation.py:341-357)"""
    plane_normal = np.asarray(plane_model[:3], dtype=np.float64)
    plane_normal = plane_normal / np.linalg.norm(plane_normal)
    if np.dot(plane_normal, average_normal) < 0:
        plane_model = [-v for v in plane_model]
        plane_normal = -plane_normal
        logging.info(":: Plane normal was flipped to match the majority of normals.")
    return list(plane_model), plane_normal


def remove_points_below_plane(pcd: PointCloud, plane_model) -> PointCloud:
    """Keep points with signed distance <= 0 (reference :364-375)."""
    a, b, c, d = plane_model
    dist = (pcd.points @ np.array([a, b, c]) + d) / np.sqrt(a * a + b * b + c * c)
    keep = np.where(dist <= 0)[0]
    return pcd.select_by_index(keep)


def remove_plane(pcd: PointCloud, inliers) -> PointCloud:
    return pcd.select_by_index(inliers, invert=True)


def background_removal(pcd: PointCloud, background: PointCloud, threshold=10.0) -> PointCloud:
    """Drop points with any background neighbor within threshold
    (reference src/pose_estimation.py:377-392)."""
    if len(background) == 0 or len(pcd) == 0:
        return pcd
    from .. import native

    if native.available():
        near = native.has_neighbor_within(pcd.points, background.points, threshold)
        keep = np.where(~near)[0]
    else:
        tree = cKDTree(background.points)
        d, _ = tree.query(pcd.points, k=1, workers=-1)
        keep = np.where(d > threshold)[0]
    if len(keep) == 0:
        return pcd
    return pcd.select_by_index(keep)


def dbscan_labels(points, eps, min_points):
    """Exact DBSCAN labels (-1 = noise).

    Replaces Open3D cluster_dbscan (reference src/pose_estimation.py:283).
    Uses the native grid-hash implementation when built
    (native/sixdof_native.cpp), else KD pair queries + union-find.
    """
    from .. import native

    if native.available():
        return native.dbscan_labels(points, eps, min_points)
    n = len(points)
    tree = cKDTree(points)
    neighbor_counts = np.array(tree.query_ball_point(points, eps, workers=-1, return_length=True))
    core = neighbor_counts >= min_points

    parent = np.arange(n)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    pairs = tree.query_pairs(eps, output_type="ndarray")
    for i, j in pairs:
        if core[i] and core[j]:
            ri, rj = find(i), find(j)
            if ri != rj:
                parent[ri] = rj

    labels = np.full(n, -1, dtype=np.int64)
    roots = {}
    for i in range(n):
        if core[i]:
            r = find(i)
            if r not in roots:
                roots[r] = len(roots)
            labels[i] = roots[r]
    # border points: attach to any core neighbor's cluster
    if len(pairs):
        for i, j in pairs:
            if labels[i] == -1 and core[j]:
                labels[i] = labels[j]
            elif labels[j] == -1 and core[i]:
                labels[j] = labels[i]
    return labels


def filter_largest_cluster(pcd: PointCloud, eps=10.0, min_points=10,
                           near_point=None, near_radius=None):
    """Keep only the largest DBSCAN cluster
    (reference src/pose_estimation.py:270-299).

    @near_point: optional (3,) expected object position — when given, the
    cluster is chosen by most points within @near_radius of it instead of by
    raw size.  The reference's size heuristic silently keeps an OCCLUDER
    when it is larger/closer than the half-hidden target (measured: the
    57%-occluded eval scene's preprocess kept 436 occluder points at
    z=441 mm and dropped the object at z=550, zeroing every downstream ICP
    fitness); callers that know the initial pose pass its translation.
    Falls back to the largest cluster when nothing is within the radius.
    """
    if len(pcd) == 0:
        return pcd
    labels = dbscan_labels(pcd.points, eps, min_points)
    valid = labels[labels != -1]
    if len(valid) == 0:
        logging.info("No valid clusters found.")
        return None
    pick = None
    if near_point is not None:
        near_point = np.asarray(near_point, dtype=np.float64).reshape(3)
        r = float(near_radius) if near_radius else 100.0
        # nearest CENTROID wins (a count-within-radius rule still prefers a
        # big occluder that merely grazes the radius); specks below 5% of
        # the clustered points are not eligible
        sizes = np.bincount(valid)
        best_d = np.inf
        for lab in np.nonzero(sizes >= max(10, 0.05 * len(valid)))[0]:
            c = pcd.points[labels == lab].mean(axis=0)
            d = float(np.linalg.norm(c - near_point))
            if d < best_d:
                best_d, pick = d, int(lab)
        if pick is None or best_d > r:
            logging.info(":: no sizeable cluster near the expected object "
                         "position; keeping the largest")
            pick = None
    if pick is None:
        pick = np.bincount(valid).argmax()
    return pcd.select_by_index(np.where(labels == pick)[0])


def remove_statistical_outliers(pcd: PointCloud, nb_neighbors=20, std_ratio=1.0) -> PointCloud:
    """Open3D remove_statistical_outlier semantics
    (reference src/pose_estimation.py:308-312)."""
    n = len(pcd)
    if n <= nb_neighbors:
        return pcd
    tree = cKDTree(pcd.points)
    d, _ = tree.query(pcd.points, k=nb_neighbors + 1, workers=-1)
    mean_d = d[:, 1:].mean(axis=1)
    mu, sigma = mean_d.mean(), mean_d.std()
    keep = np.where(mean_d <= mu + std_ratio * sigma)[0]
    return pcd.select_by_index(keep)


def smooth_resample(pcd: PointCloud, radius, n_iterations, n_points, max_nn=16) -> PointCloud:
    """Surface smoothing + uniform resampling of a point cloud.

    TPU-native stand-in for the reference's ball-pivot mesh detour
    (src/pose_estimation.py:433-464: ball-pivot triangulate at radii
    [r,2r,4r] -> filter_smooth_simple(n_iter) -> sample_points_poisson_disk
    (n_points) -> estimate_normals).  The mesh there is only a smoothing +
    blue-noise-resampling device — the result is converted straight back to a
    point cloud that ICP consumes.  We apply the same two operators directly:

    - `filter_smooth_simple` averages each vertex with its 1-ring; on a point
      cloud the equivalent operator is iterated neighborhood averaging over
      the radius-graph (neighbors within 4*radius, the largest pivot ball);
    - `sample_points_poisson_disk` yields uniformly-spread points; farthest-
      point sampling gives the same blue-noise coverage guarantee.
    """
    pts = np.asarray(pcd.points, dtype=np.float64)
    n = len(pts)
    if n == 0:
        return pcd.copy()
    tree = cKDTree(pts)
    k = min(max_nn, n)
    dists, idx = tree.query(pts, k=k, workers=-1)
    if dists.ndim == 1:
        dists, idx = dists[:, None], idx[:, None]
    w = (dists <= 4.0 * radius).astype(np.float64)
    w[:, 0] = 1.0  # self
    cnt = np.clip(w.sum(axis=1, keepdims=True), 1.0, None)
    sm = pts
    for _ in range(int(n_iterations)):
        sm = (sm[idx] * w[..., None]).sum(axis=1) / cnt
    # farthest-point sampling to n_points (uniform blue-noise coverage).
    # FPS is O(m * n_candidates) with a sequential host loop; keep it off the
    # capture-latency budget by capping candidates (uniform random pre-pick —
    # FPS spreads the survivors) and using f32 squared distances (argmax is
    # sqrt-invariant).
    m = min(int(n_points), n)
    cand_ids = np.arange(n)
    cap = 8 * m
    if n > cap:
        cand_ids = np.random.RandomState(0).choice(n, cap, replace=False)
    cand = np.ascontiguousarray(sm[cand_ids], dtype=np.float32)
    sel_local = np.empty(m, dtype=np.int64)
    sel_local[0] = 0
    dmin = ((cand - cand[0]) ** 2).sum(axis=1)
    for j in range(1, m):
        i = int(np.argmax(dmin))
        sel_local[j] = i
        dmin = np.minimum(dmin, ((cand - cand[i]) ** 2).sum(axis=1))
    sel = cand_ids[sel_local]
    out = PointCloud(
        sm[sel],
        None if pcd.colors is None else pcd.colors[sel],
        None,
    )
    return out
