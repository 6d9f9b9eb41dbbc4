"""Neural object field: truncated-SDF NeRF for model-free mesh reconstruction.

TPU-native rebuild of the reference's `bundlesdf/` subsystem
(nerf_runner.py:114-1232, nerf_helpers.py, run_nerf.py:18-74): when no CAD
model exists, fit a hash-grid SDF/color field to masked RGB-D frames with
known rough poses, then extract a mesh.

Faithful pieces (cited to the reference):
- multi-resolution hash-grid positional encoding (instant-NGP): 16 levels,
  base res 32 -> finest 512, 2 features/level, 2^22 hashmap
  (config_ycbv.yml:44-47; torch_ngp_grid_encoder/gridencoder.cu kernels) —
  here a pure-JAX gather + trilinear lerp, autodiff for free;
- spherical-harmonics direction encoding, degree 3 (nerf_helpers.py:68-160);
- NeRFSmall MLP: 2-layer sigma net (64) -> 1 SDF + 15 geo features; 3-layer
  color net (64) on [SH, geo_feat, per-frame latent] (nerf_runner.py:222);
- per-frame latent FeatureArray + se3 PoseArray corrections
  (nerf_helpers.py:25-64, nerf_runner.py:236-241);
- depth-band compositing `sdf2weights` (nerf_runner.py:868-877) and the
  truncated-SDF losses: rgb x100, free-space x100, empty x1, sdf x6000,
  feature/pose regs (nerf_runner.py:507-585, nerf_helpers.py:398-428);
- scene normalization to [-1,1] x 0.9 and `mesh_to_real_world`
  (tool.py:27-130, nerf_helpers.py:215-221).

Replaced (TPU-first): the kaolin octree + two mycuda ray-span kernels become
uniform ray-box sampling + samples around the depth (static shapes, no
ragged intersections); marching cubes becomes marching TETRAHEDRA on host
(no 2.5k-entry tables, same isosurface); the broken texture bake
(nerf_runner.py:1133 imports a missing module) becomes direct per-vertex
color queries of the fitted field.
"""
from __future__ import annotations

import functools
import logging
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

BAD_DEPTH = 99.0
BAD_COLOR = 0


# ------------------------------------------------------------- hash grid  --


class HashGridSpec(NamedTuple):
    n_levels: int = 16
    base_res: int = 32
    finest_res: int = 512
    level_dim: int = 2
    log2_hashmap_size: int = 22

    @property
    def per_level_scale(self):
        return math.exp(math.log(self.finest_res / self.base_res) / (self.n_levels - 1))

    def level_res(self, l):
        return int(math.floor(self.base_res * self.per_level_scale**l))

    def level_size(self, l):
        res = self.level_res(l)
        dense = (res + 1) ** 3
        return min(dense, 2**self.log2_hashmap_size)

    @property
    def offsets(self):
        offs = [0]
        for l in range(self.n_levels):
            offs.append(offs[-1] + self.level_size(l))
        return offs

    @property
    def out_dim(self):
        return self.n_levels * self.level_dim


_PRIMES = (1, 2654435761, 805459861)


def init_hash_grid(key, spec: HashGridSpec):
    total = spec.offsets[-1]
    return jax.random.uniform(key, (total, spec.level_dim), minval=-1e-4, maxval=1e-4)


def hash_grid_indices(x, spec: HashGridSpec):
    """All (level, corner) table indices + trilinear weights in one shot.

    @x: (N,3) in [-1,1] -> idx (8, L, N) int32 into the GLOBAL table (level
    offsets folded in), w (8, L, N) float32 trilinear weights.

    Vectorized over levels AND corners so the whole encode is ONE gather —
    and, crucially, its autodiff backward is ONE scatter-add per feature
    column instead of the 128 per-(level,corner) scatters the old unrolled
    loop emitted (that unrolled graph compiled in ~520 s and its backward
    ran ~5.5 s/step at 2048 rays x 256 samples; r3s4 notes).

    Layout is corner/level-major with N MINOR on purpose: TPU tiling pads
    the minor (lane) dim to 128, so (N, L, 8)/(N, L, 3) layouts blow every
    intermediate up 16-42x and the fwd graph alone OOMs HBM at compile time
    (measured: 17.1 G > 15.75 G at N=524288).  With N minor nothing pads.
    """
    L = spec.n_levels
    res = np.array([spec.level_res(l) for l in range(L)], np.int32)
    size = np.array([spec.level_size(l) for l in range(L)], np.uint32)
    dense = np.array([(int(r) + 1) ** 3 <= int(s) for r, s in zip(res, size)])
    offs = np.array(spec.offsets[:-1], np.int32)

    x01 = (x + 1.0) / 2.0  # [0,1], (N,3)
    cds, ws = [], []
    for d in range(3):  # 3 host-unrolled coord channels, each (L,N)/(2,L,N)
        pos = jnp.asarray(res, x.dtype)[:, None] * x01[:, d][None, :]  # (L,N)
        p0 = jnp.floor(pos).astype(jnp.int32)
        frac = pos - p0
        p0 = jnp.clip(p0, 0, jnp.asarray(res - 1, jnp.int32)[:, None])
        cds.append(jnp.stack([p0, p0 + 1]))       # (2,L,N) corner coords
        ws.append(jnp.stack([1.0 - frac, frac]))  # (2,L,N) corner weights

    # corner c in 0..7 selects bit (c>>d)&1 of coordinate d
    sel = np.array([[(c >> d) & 1 for c in range(8)] for d in range(3)])  # (3,8)
    cx, cy, cz = (cds[d][sel[d]] for d in range(3))  # each (8,L,N)
    w = ws[0][sel[0]] * ws[1][sel[1]] * ws[2][sel[2]]  # (8,L,N)

    res1 = jnp.asarray(res + 1, jnp.int32)[None, :, None]  # (1,L,1)
    dense_idx = (cx * res1 + cy) * res1 + cz  # garbage where hashed (masked)
    hash_idx = (
        cx.astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
        ^ cy.astype(jnp.uint32) * jnp.uint32(_PRIMES[1])
        ^ cz.astype(jnp.uint32) * jnp.uint32(_PRIMES[2])
    ) % jnp.asarray(size, jnp.uint32)[None, :, None]
    idx = jnp.where(jnp.asarray(dense)[None, :, None], dense_idx,
                    hash_idx.astype(jnp.int32))
    idx = idx + jnp.asarray(offs, jnp.int32)[None, :, None]
    return idx, w


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _lookup_col(spec: HashGridSpec, table_col, idx, w):
    """sum_c w_c * table_col[idx_c] with a hand-written backward.

    Autodiff of the gather emits (a) a 67M-row re-gather for d_w and (b) one
    global duplicate-index scatter-add for d_table.  Both are replaced: the
    forward-gathered values are SAVED as residuals (d_w = g * cot, no
    gather), and d_table scatters PER LEVEL into each level's own index
    space — measured 0.52 s vs 0.76 s for the global scatter at the
    campaign's 67M-update scale (tools/exp_scatter.py; the duplicate-index
    scatter is the TPU stand-in for torch-ngp's atomicAdd,
    gridencoder.cu:248)."""
    return jnp.sum(w * table_col[idx], axis=0)  # (L,N)


def _lookup_col_fwd(spec, table_col, idx, w):
    g = table_col[idx]  # (8,L,N) — residual: kills both backward gathers
    return jnp.sum(w * g, axis=0), (g, idx, w)


def _lookup_col_bwd(spec, res, cot):
    g, idx, w = res  # (8,L,N) each; cot (L,N)
    upd = w * cot[None]
    d_w = g * cot[None]
    offs = spec.offsets
    parts = []
    for l in range(spec.n_levels):
        li = idx[:, l].reshape(-1) - offs[l]
        parts.append(jnp.zeros((spec.level_size(l),), g.dtype).at[li].add(
            upd[:, l].reshape(-1)))
    d_table = jnp.concatenate(parts)
    d_idx = np.zeros(idx.shape, jax.dtypes.float0)  # int arg: zero-size tangent
    return d_table, d_idx, d_w


_lookup_col.defvjp(_lookup_col_fwd, _lookup_col_bwd)


def hash_grid_encode(table, x, spec: HashGridSpec):
    """@x: (N,3) in [-1,1] -> (N, n_levels*level_dim) features.

    One gather per feature column + weighted corner sum (instant-NGP
    semantics, torch_ngp_grid_encoder/gridencoder.cu:96); backward is one
    per-level duplicate-index scatter-add per column into the table
    (_lookup_col custom vjp).  All big intermediates are (8, L, N) with N
    minor — see hash_grid_indices."""
    idx, w = hash_grid_indices(x, spec)
    outs = [_lookup_col(spec, table[:, f], idx, w) for f in range(spec.level_dim)]
    # (level_dim, L, N) -> (N, L, level_dim) -> (N, out_dim); only this final
    # transpose touches a small-minor layout and it is the MLP's input anyway
    out = jnp.stack(outs)  # (level_dim, L, N)
    return jnp.transpose(out, (2, 1, 0)).reshape(x.shape[0], spec.out_dim)


# ------------------------------------------------------------ SH encoding --

_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396]


def sh_encode(d, degree=3):
    """Real SH basis up to `degree` (out dim degree^2), matching SHEncoder
    (nerf_helpers.py:68-160)."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    out = [jnp.full_like(x, _C0)]
    if degree > 1:
        out += [-_C1 * y, _C1 * z, -_C1 * x]
    if degree > 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            _C2[0] * xy, _C2[1] * yz, _C2[2] * (2.0 * zz - xx - yy),
            _C2[3] * xz, _C2[4] * (xx - yy),
        ]
    return jnp.stack(out, axis=-1)


# ------------------------------------------------------------------ model --


class FieldParams(NamedTuple):
    table: jnp.ndarray  # hash grid
    sigma_w: tuple  # ((in,64),(64,16)) weights+biases
    color_w: tuple
    frame_features: jnp.ndarray  # (n_frames, F)
    pose_deltas: jnp.ndarray  # (n_frames, 6) se3


def init_field(key, spec: HashGridSpec, n_frames, frame_feat_dim=2, sh_degree=3):
    ks = jax.random.split(key, 8)
    in_dim = spec.out_dim
    sh_dim = sh_degree**2

    def dense(key, i, o):
        scale = math.sqrt(2.0 / i)
        return (jax.random.normal(key, (i, o)) * scale, jnp.zeros(o))

    sigma1 = dense(ks[0], in_dim, 64)
    sigma2 = dense(ks[1], 64, 16)
    # bias the SDF positive like the reference init (nerf_helpers.py:305)
    sigma2 = (sigma2[0], sigma2[1].at[0].set(0.1))
    c_in = sh_dim + frame_feat_dim + 15
    color1 = dense(ks[2], c_in, 64)
    color2 = dense(ks[3], 64, 64)
    color3 = dense(ks[4], 64, 3)
    return FieldParams(
        table=init_hash_grid(ks[5], spec),
        sigma_w=(sigma1, sigma2),
        color_w=(color1, color2, color3),
        frame_features=jnp.zeros((n_frames, frame_feat_dim)),
        pose_deltas=jnp.zeros((n_frames, 6)),
    )


def field_sdf(params: FieldParams, x, spec: HashGridSpec):
    h = hash_grid_encode(params.table, x, spec)
    (w1, b1), (w2, b2) = params.sigma_w
    h = jax.nn.relu(h @ w1 + b1)
    out = h @ w2 + b2
    return out[..., 0], out[..., 1:]


def field_color(params: FieldParams, geo_feat, dirs, frame_feat, sh_degree=3):
    sh = sh_encode(dirs, sh_degree)
    h = jnp.concatenate([sh, frame_feat, geo_feat], axis=-1)
    (w1, b1), (w2, b2), (w3, b3) = params.color_w
    h = jax.nn.relu(h @ w1 + b1)
    h = jax.nn.relu(h @ w2 + b2)
    return h @ w3 + b3  # raw logits; sigmoid at compositing


# -------------------------------------------------------------- rendering --


def ray_box_intersect(origins, dirs, lo=-1.0, hi=1.0):
    """Slab test against the normalized cube; returns (near, far) clamped."""
    inv = 1.0 / jnp.where(jnp.abs(dirs) > 1e-9, dirs, 1e-9)
    t0 = (lo - origins) * inv
    t1 = (hi - origins) * inv
    tmin = jnp.minimum(t0, t1).max(axis=-1)
    tmax = jnp.maximum(t0, t1).min(axis=-1)
    return jnp.maximum(tmin, 0.0), jnp.maximum(tmax, 0.0)


def sample_z_vals(key, origins, dirs, target_d, n_uniform, n_depth, truncation,
                  neg_trunc_ratio, far_cap):
    """Uniform box samples + samples around the depth, sorted.

    Replaces the octree span sampling (nerf_runner.py:730-845 +
    mycuda sampleRaysUniformOccupiedVoxels) with static-shape sampling.
    """
    N = origins.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    near, far = ray_box_intersect(origins, dirs)
    far = jnp.minimum(far, far_cap)
    u = (jnp.arange(n_uniform) + jax.random.uniform(k1, (N, n_uniform))) / n_uniform
    z_uni = near[:, None] + (far - near)[:, None] * u
    has_depth = (target_d < far_cap) & (target_d > 0)
    lo = target_d[:, None] - truncation
    hi = target_d[:, None] + truncation * neg_trunc_ratio
    z_dep = lo + (hi - lo) * jax.random.uniform(k2, (N, n_depth))
    # rays without valid depth get a SECOND stratified uniform set over
    # [near, far] (reference nerf_runner.py:791-795), not a replicated first
    # sample that would overweight the box entry in the free-space loss
    u2 = (jnp.arange(n_depth) + jax.random.uniform(k3, (N, n_depth))) / n_depth
    z_uni2 = near[:, None] + (far - near)[:, None] * u2
    z_dep = jnp.where(has_depth[:, None], z_dep, z_uni2)
    z = jnp.sort(jnp.concatenate([z_uni, z_dep], axis=-1), axis=-1)
    valid = z > 0
    return z, valid


def sdf2weights(sdf_unused, z_vals, depth, truncation, sdf_lambda, neg_trunc_ratio, far_cap):
    """Depth-band compositing weights (nerf_runner.py:868-877)."""
    f = (depth[:, None] - z_vals) / truncation
    w = jax.nn.sigmoid(f * sdf_lambda) * jax.nn.sigmoid(-f * sdf_lambda)
    invalid = depth > far_cap
    band = (z_vals - depth[:, None] <= truncation * neg_trunc_ratio) & (
        z_vals - depth[:, None] >= -truncation
    )
    w = jnp.where(invalid[:, None], 0.0, jnp.where(band, w, 0.0))
    return w / (w.sum(axis=-1, keepdims=True) + 1e-10)


# ----------------------------------------------------------------- runner --


class ObjectFieldConfig(NamedTuple):
    n_step: int = 1000
    n_rand: int = 2048
    n_samples: int = 128
    n_samples_around_depth: int = 128
    lrate: float = 0.01
    trunc: float = 0.01
    neg_trunc_ratio: float = 1.0
    sdf_lambda: float = 5.0
    rgb_weight: float = 100.0
    fs_weight: float = 100.0
    empty_weight: float = 1.0
    trunc_weight: float = 6000.0
    fs_sdf: float = 1.0
    feature_reg_weight: float = 0.1
    pose_reg_weight: float = 0.01
    far: float = 2.0
    first_frame_weight: float = 1.0
    sh_degree: int = 3
    frame_feat_dim: int = 2
    optimize_poses: bool = True
    max_trans: float = 0.02  # meters; tanh bound on pose correction (config_ycbv.yml:95)
    max_rot: float = 10.0  # degrees (config_ycbv.yml:96)


def compute_scene_bounds(pts):
    """Normalization like tool.py:27-38: translate to center, scale so the
    cloud fits in [-1,1]*0.9.  Returns (sc_factor, translation)."""
    mn, mx = pts.min(axis=0), pts.max(axis=0)
    center = (mn + mx) / 2
    translation = -center
    radius = np.abs(pts + translation).max()
    sc_factor = 0.9 / radius
    return float(sc_factor), translation


def make_frame_rays(rgbs, depths, masks, poses, K, sc_factor, dilate=10):
    """Flattened per-pixel ray table (host-side, once).

    Layout mirrors the reference rays tensor (nerf_runner.py:247-317):
    [origin(3), dir(3), rgb(3), depth(1), frame_id(1)] in the NORMALIZED
    object frame; OpenCV pinhole dirs transformed by cam-in-ob poses.
    """
    import cv2

    n, H, W = depths.shape
    rows = []
    us, vs = np.meshgrid(np.arange(W), np.arange(H))
    dirs_cam = np.stack(
        [(us - K[0, 2]) / K[0, 0], (vs - K[1, 2]) / K[1, 1], np.ones_like(us, dtype=np.float64)],
        axis=-1,
    )
    for i in range(n):
        m = (masks[i] > 0).astype(np.uint8)
        if dilate > 0:
            m = cv2.dilate(m, np.ones((dilate, dilate), np.uint8))
        ys, xs = np.where(m > 0)
        d = depths[i][ys, xs] * sc_factor
        d = np.where(depths[i][ys, xs] >= BAD_DEPTH * 0.9, BAD_DEPTH, d)
        dirs = dirs_cam[ys, xs] @ poses[i][:3, :3].T
        origins = np.tile(poses[i][:3, 3], (len(ys), 1))
        rgb = rgbs[i][ys, xs]
        rows.append(
            np.concatenate(
                [origins, dirs, rgb, d[:, None], np.full((len(ys), 1), i, dtype=np.float64)],
                axis=-1,
            )
        )
    return np.concatenate(rows).astype(np.float32)



def make_loss_fn(cfg_ref: ObjectFieldConfig, spec_ref: HashGridSpec, sc: float):
    """Build the jittable training loss (rgb + truncated-SDF terms)."""

    def loss_fn(params: FieldParams, batch, key):
        o = batch[:, 0:3]
        d = batch[:, 3:6]
        target_rgb = batch[:, 6:9]
        target_d = batch[:, 9]
        fids = batch[:, 10].astype(jnp.int32)

        if cfg_ref.optimize_poses:
            from ..ops.lie import se3_exp_map

            # reference PoseArray (nerf_helpers.py:44-64): tanh-bounded
            # corrections, and frame 0 pinned to identity — otherwise the
            # gauge drifts and the extracted mesh is misaligned relative to
            # the tracked cam_in_ob poses
            theta = jnp.tanh(params.pose_deltas[fids])
            tw = jnp.concatenate(
                [theta[:, :3] * cfg_ref.max_trans,
                 theta[:, 3:6] * (cfg_ref.max_rot * jnp.pi / 180.0)], axis=-1)
            tw = jnp.where((fids == 0)[:, None], 0.0, tw)
            delta = se3_exp_map(tw)
            o = (delta[:, :3, :3] @ o[..., None])[..., 0] + delta[:, :3, 3]
            d = (delta[:, :3, :3] @ d[..., None])[..., 0]

        # trunc/far are METERS in the config; normalize like the reference
        # (get_truncation, nerf_runner.py:503; far*sc_factor comparisons)
        trunc = cfg_ref.trunc * sc
        far_n = cfg_ref.far * sc
        z, valid = sample_z_vals(
            key, o, d, target_d, cfg_ref.n_samples, cfg_ref.n_samples_around_depth,
            trunc, cfg_ref.neg_trunc_ratio, far_n,
        )
        pts = o[:, None] + d[:, None] * z[..., None]  # (N,S,3)
        N, S = z.shape
        sdf, geo = field_sdf(params, pts.reshape(-1, 3), spec_ref)
        sdf = sdf.reshape(N, S)
        dirs_flat = jnp.repeat(d, S, axis=0)
        ff = jnp.repeat(params.frame_features[fids], S, axis=0)
        rgb_raw = field_color(params, geo, dirs_flat, ff, cfg_ref.sh_degree)
        rgb = jax.nn.sigmoid(rgb_raw).reshape(N, S, 3)

        w = sdf2weights(sdf, z, target_d, trunc, cfg_ref.sdf_lambda,
                        cfg_ref.neg_trunc_ratio, far_n)
        w = jnp.where(valid, w, 0.0)
        rgb_map = jnp.sum(w[..., None] * rgb, axis=-2)

        ray_w = jnp.where(fids == 0, cfg_ref.first_frame_weight, 1.0)
        has_depth = target_d <= far_n
        rgb_loss = cfg_ref.rgb_weight * jnp.mean(
            (rgb_map - target_rgb) ** 2 * (ray_w * has_depth)[:, None]
        )

        # truncated-SDF losses (nerf_helpers.py:398-428)
        td = target_d[:, None]
        sample_w = ray_w[:, None] * valid
        front = z < td - trunc
        back = z > td + trunc * cfg_ref.neg_trunc_ratio
        sdf_band = (~front) & (~back) & has_depth[:, None]
        fs_mask = (~has_depth)[:, None] & (sdf < cfg_ref.fs_sdf)
        fs_loss = cfg_ref.fs_weight * 0.5 * jnp.mean(
            ((sdf - cfg_ref.fs_sdf) * fs_mask) ** 2 * sample_w
        )
        empty_mask = front & has_depth[:, None] & (sdf < 1)
        empty_loss = cfg_ref.empty_weight * jnp.mean(
            jnp.abs(sdf - 1.0) * empty_mask * sample_w
        )
        sdf_loss = cfg_ref.trunc_weight * 0.5 * jnp.mean(
            ((z + sdf * trunc) * sdf_band - td * sdf_band) ** 2 * sample_w
        )
        reg = cfg_ref.feature_reg_weight * jnp.mean(params.frame_features**2)
        pose_reg = cfg_ref.pose_reg_weight * jnp.sum(params.pose_deltas[1:] ** 2)
        total = rgb_loss + fs_loss + empty_loss + sdf_loss + reg + pose_reg
        return total, {
            "rgb": rgb_loss, "fs": fs_loss, "empty": empty_loss, "sdf": sdf_loss,
        }

    return loss_fn


class ObjectFieldRunner:
    """NerfRunner equivalent: fit the field, extract the mesh."""

    def __init__(self, cfg: ObjectFieldConfig, K, rgbs, depths, masks, cam_in_obs,
                 spec: HashGridSpec = HashGridSpec(), seed=0):
        """@rgbs: (N,H,W,3) uint8; @depths: (N,H,W) meters; @masks: (N,H,W);
        @cam_in_obs: (N,4,4) camera-in-object (OpenCV pinhole convention)."""
        self.cfg = cfg
        self.spec = spec
        n = len(rgbs)

        depths = depths.astype(np.float64).copy()
        depths[depths < 0.001] = BAD_DEPTH
        rgbs = rgbs.astype(np.float64).copy()
        rgbs[masks == 0] = BAD_COLOR
        depths[masks == 0] = BAD_DEPTH

        # scene normalization from the fused masked cloud (tool.py:65-130)
        pts_all = []
        for i in range(n):
            ys, xs = np.where((masks[i] > 0) & (depths[i] < BAD_DEPTH * 0.9))
            z = depths[i][ys, xs]
            x = (xs - K[0, 2]) * z / K[0, 0]
            y = (ys - K[1, 2]) * z / K[1, 1]
            p_cam = np.stack([x, y, z], axis=-1)
            pts_all.append(p_cam @ cam_in_obs[i][:3, :3].T + cam_in_obs[i][:3, 3])
        pts_all = np.concatenate(pts_all)
        self.sc_factor, self.translation = compute_scene_bounds(pts_all)

        poses = cam_in_obs.copy().astype(np.float64)
        poses[:, :3, 3] += self.translation
        poses[:, :3, 3] *= self.sc_factor

        self.poses_normalized = poses
        self.rays = make_frame_rays(rgbs / 255.0, depths, masks, poses, K, self.sc_factor)
        logging.info(f"rays: {self.rays.shape}, sc_factor {self.sc_factor:.4f}")

        self.params = init_field(jax.random.PRNGKey(seed), spec, n,
                                 cfg.frame_feat_dim, cfg.sh_degree)
        self.tx = optax.adam(cfg.lrate)
        self.opt_state = self.tx.init(self.params)
        self.global_step = 0
        self._rng = np.random.RandomState(seed)

        self._build_step()

    def _build_step(self):
        """(Re)build the jitted train step — the loss closure bakes sc_factor,
        so a load_weights that restores a different normalization must call
        this again."""
        loss_fn = make_loss_fn(self.cfg, self.spec, float(self.sc_factor))
        n_rand = int(self.cfg.n_rand)

        def step(params, opt_state, rays, key):
            # minibatch sampled ON DEVICE: the ray table lives in HBM and the
            # step is a single dispatch — per-step host fancy-indexing +
            # uploads through the TPU tunnel dominated wall-clock (the r3s2
            # campaigns measured ~6-7 s/step under tunnel load; one-time
            # upload + device gather removes every per-step transfer)
            kidx, key = jax.random.split(key)
            idx = jax.random.randint(kidx, (n_rand,), 0, rays.shape[0])
            batch = rays[idx]
            (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch, key)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, parts

        self._step = jax.jit(step, donate_argnums=(0, 1))
        self._rays_dev = None

    def train(self, n_steps=None, log_every=100, ckpt_dir=None, ckpt_every=250):
        """@ckpt_dir: when set, a checkpoint is written every `ckpt_every`
        steps (reference saves every i_weights steps, nerf_runner.py:593) —
        over the remote tunnel a campaign can die to link weather at any
        point, and an end-of-training-only save loses everything."""
        n_steps = n_steps or self.cfg.n_step
        key = jax.random.PRNGKey(1)
        losses = []
        if self._rays_dev is None:
            self._rays_dev = jnp.asarray(self.rays)
        for i in range(n_steps):
            key, sub = jax.random.split(key)
            self.params, self.opt_state, loss, parts = self._step(
                self.params, self.opt_state, self._rays_dev, sub
            )
            self.global_step += 1
            # keep the loss on device: a float() here is a blocking host
            # round-trip per step (~45 ms over the TPU tunnel); read all
            # scalars back in one transfer after the loop
            losses.append(loss)
            if log_every and i % log_every == 0:
                logging.info(
                    f"field step {i}: loss {float(loss):.4f} "
                    + " ".join(f"{k}={float(v):.4f}" for k, v in parts.items())
                )
            if ckpt_dir and ckpt_every and (i + 1) % ckpt_every == 0 and i + 1 < n_steps:
                self.save_weights(ckpt_dir)
        return np.asarray(jnp.stack(losses)).tolist() if losses else []

    # -------------------------------------------------------- checkpointing --

    def save_weights(self, path):
        """Orbax checkpoint of field params + optimizer + step (the reference
        saves model/optimizer/embedders/pose+feature arrays, nerf_runner.py:
        393-421)."""
        from ..parallel.train import save_params

        save_params(path, {
            "field": self.params._asdict(),
            "step": np.asarray(self.global_step),
            "sc_factor": np.asarray(self.sc_factor),
            "translation": np.asarray(self.translation),
        })

    def load_weights(self, path):
        import os

        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(os.path.abspath(path))
        f = restored["params"]["field"]
        self.params = FieldParams(
            table=jnp.asarray(f["table"]),
            sigma_w=tuple(tuple(jnp.asarray(a) for a in lw) for lw in f["sigma_w"]),
            color_w=tuple(tuple(jnp.asarray(a) for a in lw) for lw in f["color_w"]),
            frame_features=jnp.asarray(f["frame_features"]),
            pose_deltas=jnp.asarray(f["pose_deltas"]),
        )
        self.global_step = int(restored["params"]["step"])
        # restore the normalization the field was TRAINED in: the hash grid
        # and any extracted mesh live in that normalized frame, not the one
        # computed from this runner's (possibly different) frame set
        if "sc_factor" in restored["params"]:
            old_sc = float(self.sc_factor)
            self.sc_factor = float(np.asarray(restored["params"]["sc_factor"]))
            self.translation = np.asarray(restored["params"]["translation"])
            if self.sc_factor != old_sc:
                self._build_step()
        self.opt_state = self.tx.init(self.params)
        return self

    # ---------------------------------------------------------- extraction --

    def query_sdf_grid(self, resolution=128, chunk=1 << 17):
        """SDF on a dense grid over [-1,1]^3 (chunked device queries)."""
        lin = np.linspace(-1, 1, resolution)
        pts = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), axis=-1).reshape(-1, 3)
        out = np.empty(len(pts), dtype=np.float32)
        # params must be an ARGUMENT, not a closure: closed-over device arrays
        # become HLO constants, and a 287 MB table baked into the program blows
        # the remote-compile request limit (HTTP 413 over the axon tunnel —
        # hit by the first full-scale TPU campaign, r4)
        fn = jax.jit(lambda params, p: field_sdf(params, p, self.spec)[0])
        for i in range(0, len(pts), chunk):
            end = min(i + chunk, len(pts))
            buf = np.zeros((chunk, 3), dtype=np.float32)
            buf[: end - i] = pts[i:end]
            out[i:end] = np.asarray(fn(self.params, jnp.asarray(buf)))[: end - i]
        return out.reshape(resolution, resolution, resolution)

    def extract_mesh(self, resolution=128, isolevel=0.0):
        """Marching tetrahedra over the SDF grid -> TriMesh in NORMALIZED frame
        (reference extract_mesh, nerf_runner.py:1062-1118)."""
        from ..io.mesh_io import TriMesh
        from ..ops.marching import marching_tetrahedra

        sdf = self.query_sdf_grid(resolution)
        verts, faces = marching_tetrahedra(sdf, isolevel)
        if len(verts) == 0:
            return TriMesh(np.zeros((0, 3)), np.zeros((0, 3), np.int64))
        verts = verts / (resolution - 1) * 2.0 - 1.0
        return TriMesh(verts, faces)

    def color_mesh(self, mesh, frame_id=0):
        """Per-vertex colors by querying the fitted field (replaces the
        reference's broken texture bake, nerf_runner.py:1121-1232)."""
        if len(mesh.vertices) == 0:
            return mesh
        pts = jnp.asarray(mesh.vertices, dtype=jnp.float32)
        sdf, geo = field_sdf(self.params, pts, self.spec)
        # view dirs point camera->surface during training (dot(d, outward
        # normal) < 0), so query with the INWARD normal to stay in-distribution
        vn = np.asarray(mesh.vertex_normals, dtype=np.float32)
        vn = vn / np.maximum(np.linalg.norm(vn, axis=-1, keepdims=True), 1e-12)
        dirs = jnp.asarray(-vn)
        ff = jnp.tile(self.params.frame_features[frame_id][None], (len(mesh.vertices), 1))
        rgb = jax.nn.sigmoid(field_color(self.params, geo, dirs, ff, self.cfg.sh_degree))
        mesh.vertex_colors = np.asarray(rgb) * 255.0
        return mesh

    def bake_texture(self, mesh, cell=16, frame_id=0, chunk=1 << 16):
        """Per-face UV atlas texture bake from the fitted field.

        Produces what the reference's mesh_texture_from_train_images intended
        (nerf_runner.py:1121-1232 — broken in-snapshot: it imports a missing
        `offscreen_renderer` at :1133): a textured mesh with a real texture
        IMAGE, not just vertex colors.  Instead of reprojecting training
        images, each texel maps by fixed barycentric layout to a surface point
        whose color the fitted field supplies — no rasterizer needed and no
        view-selection heuristics (the field already fused all views).

        Each triangle gets one cell of a square atlas; texel (x,y) of a cell
        maps affinely to barycentrics, clamped onto the triangle so edge
        texels bleed the rim color (bilinear-safe).  Returns a NEW TriMesh
        with per-corner UVs (vertices duplicated per face) and a (S,S,3)
        uint8 texture; the input mesh must be in the NORMALIZED field frame
        (bake before mesh_to_real_world).
        """
        from ..io.mesh_io import TriMesh

        faces = np.asarray(mesh.faces)
        T = len(faces)
        if T == 0:
            return mesh
        C = int(np.ceil(np.sqrt(T)))
        S = C * cell
        margin = 1.0

        # local texel -> barycentric (affine; clamp onto the triangle)
        xs = (np.arange(cell) + 0.5 - margin) / (cell - 2 * margin)
        l1 = np.tile(xs[None, :], (cell, 1))  # along +x
        l2 = np.tile(xs[:, None], (1, cell))  # along +y
        l1 = np.clip(l1, 0.0, 1.0)
        l2 = np.clip(l2, 0.0, 1.0)
        over = l1 + l2
        scale = np.where(over > 1.0, 1.0 / np.maximum(over, 1e-9), 1.0)
        l1, l2 = l1 * scale, l2 * scale
        l0 = 1.0 - l1 - l2  # (cell,cell)

        tri = np.asarray(mesh.vertices)[faces]  # (T,3,3)
        pts = (
            l0[None, ..., None] * tri[:, None, None, 0]
            + l1[None, ..., None] * tri[:, None, None, 1]
            + l2[None, ..., None] * tri[:, None, None, 2]
        ).reshape(-1, 3)  # (T*cell*cell, 3)

        # INWARD face normals as view dirs (training dirs run camera->surface,
        # i.e. against the outward normal) + the frame's latent, chunked query
        n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        dirs = np.repeat(-n, cell * cell, axis=0)
        ff_row = np.asarray(self.params.frame_features[frame_id])
        rgb = np.empty((len(pts), 3), dtype=np.float32)

        def q(params, ffr, p, d):
            # params as an argument — a closed-over table would be baked into
            # the program as a constant (see query_sdf_grid)
            sdf, geo = field_sdf(params, p, self.spec)
            ff = jnp.tile(ffr[None], (p.shape[0], 1))
            return jax.nn.sigmoid(field_color(params, geo, d, ff, self.cfg.sh_degree))

        qj = jax.jit(q)
        for i in range(0, len(pts), chunk):
            end = min(i + chunk, len(pts))
            pb = np.zeros((chunk, 3), dtype=np.float32)
            db = np.zeros((chunk, 3), dtype=np.float32)
            pb[: end - i] = pts[i:end]
            db[: end - i] = dirs[i:end]
            rgb[i:end] = np.asarray(qj(self.params, jnp.asarray(ff_row),
                                       jnp.asarray(pb), jnp.asarray(db)))[: end - i]

        # scatter cells into the atlas (pad the face range to the full grid)
        tex = np.zeros((C * C, cell, cell, 3), dtype=np.float32)
        tex[:T] = rgb.reshape(T, cell, cell, 3)
        tex = (
            tex.reshape(C, C, cell, cell, 3).transpose(0, 2, 1, 3, 4).reshape(S, S, 3)
        )
        tex_u8 = (np.clip(tex, 0.0, 1.0) * 255).astype(np.uint8)

        # per-corner UVs (OBJ convention: v from the bottom; atlas row 0 = top)
        cols = np.arange(T) % C
        rows = np.arange(T) // C
        x0 = cols * cell + margin - 0.5
        y0 = rows * cell + margin - 0.5
        span = cell - 2 * margin
        corners = np.stack(
            [
                np.stack([x0, y0], -1),           # l0 corner
                np.stack([x0 + span, y0], -1),    # l1 corner
                np.stack([x0, y0 + span], -1),    # l2 corner
            ],
            axis=1,
        )  # (T,3,2) in texel coords
        uv = np.empty((T, 3, 2))
        uv[..., 0] = (corners[..., 0] + 0.5) / S
        uv[..., 1] = 1.0 - (corners[..., 1] + 0.5) / S

        new_verts = tri.reshape(-1, 3)
        new_faces = np.arange(3 * T, dtype=np.int64).reshape(T, 3)
        return TriMesh(new_verts, new_faces, uv=uv.reshape(-1, 2), texture=tex_u8)

    def mesh_to_real_world(self, mesh):
        """(nerf_helpers.py:215-221)"""
        mesh.vertices = mesh.vertices / self.sc_factor - np.asarray(self.translation).reshape(1, 3)
        return mesh

    def get_optimized_poses(self):
        """Per-frame camera-in-object poses with the learned corrections
        applied, in real-world units (reference
        get_optimized_poses_in_real_world, nerf_helpers.py:224-250 — OpenCV
        convention throughout here, and frame 0 is pinned to identity so no
        re-anchoring offset is needed)."""
        from ..ops.lie import se3_exp_map

        theta = np.tanh(np.asarray(self.params.pose_deltas, dtype=np.float64))
        tw = np.concatenate(
            [theta[:, :3] * self.cfg.max_trans,
             theta[:, 3:6] * (self.cfg.max_rot * np.pi / 180.0)], axis=-1)
        tw[0] = 0.0
        delta = np.asarray(se3_exp_map(jnp.asarray(tw)))
        opt = delta @ self.poses_normalized
        opt[:, :3, 3] = opt[:, :3, 3] / self.sc_factor - np.asarray(self.translation)
        return opt.astype(np.float32)


def run_neural_object_field(cfg: ObjectFieldConfig, K, rgbs, depths, masks, cam_in_obs,
                            resolution=128, train_steps=None, ckpt_dir=None,
                            spec: HashGridSpec = None):
    """One-call model-free mesh creation (reference run_nerf.py:18-46).

    @ckpt_dir: when given, weights are saved BEFORE mesh extraction — a
    campaign's training result survives any extraction-stage failure (the
    r4 TPU campaign lost 1000 steps to an extraction-time crash).
    @spec: optional hash-grid spec override (the r5 ablation runs the
    campaign at log2=19: 52 MB table, ~25% faster step, quality gated by
    the chamfer check)."""
    import time as _time

    runner = ObjectFieldRunner(cfg, K, rgbs, depths, masks, cam_in_obs,
                               spec=spec or HashGridSpec())
    t0 = _time.perf_counter()
    losses = runner.train(train_steps, ckpt_dir=ckpt_dir)
    # train() syncs at the end (loss readback), so this is honest wall time;
    # recorded on the runner for campaign artifacts (tools/run_object_field)
    runner.train_seconds = _time.perf_counter() - t0
    runner.final_loss = float(losses[-1]) if losses else float("nan")
    if ckpt_dir:
        runner.save_weights(ckpt_dir)
    mesh = runner.extract_mesh(resolution=resolution)
    mesh = runner.color_mesh(mesh)
    mesh = runner.mesh_to_real_world(mesh)
    return mesh, runner


# ------------------------------------------------------------- occupancy  --


class OccupancyGrid:
    """Dense voxel occupancy over [-1,1]^3 (kaolin-SPC-octree stand-in).

    The reference accelerates NeRF ray sampling with a kaolin octree +
    CUDA span kernels (Utils.py:904-993, nerf_runner.py:320-375, including a
    27-neighborhood dilation).  A dense occupancy grid is the XLA-native
    equivalent: O(1) voxel queries, vectorized ray marching, static shapes.
    """

    def __init__(self, points, resolution=64, dilate=1):
        """@points: (N,3) in the NORMALIZED [-1,1] frame."""
        self.resolution = int(resolution)
        idx = np.clip(((np.asarray(points) + 1.0) / 2.0 * self.resolution).astype(np.int64),
                      0, self.resolution - 1)
        grid = np.zeros((self.resolution,) * 3, dtype=bool)
        grid[idx[:, 0], idx[:, 1], idx[:, 2]] = True
        if dilate > 0:
            import jax.lax as lax

            g = jnp.asarray(grid[None, ..., None], dtype=jnp.float32)
            k = 2 * dilate + 1
            g = lax.reduce_window(g, -jnp.inf, lax.max, (1, k, k, k, 1), (1, 1, 1, 1, 1),
                                  "SAME")
            grid = np.asarray(g[0, ..., 0] > 0.5)
        self.grid = jnp.asarray(grid)
        self.vox_size = 2.0 / self.resolution

    def query(self, pts):
        """(N,3) normalized points -> (N,) bool occupancy."""
        idx = jnp.clip(((pts + 1.0) / 2.0 * self.resolution).astype(jnp.int32),
                       0, self.resolution - 1)
        return self.grid[idx[..., 0], idx[..., 1], idx[..., 2]]

    def ray_near_far(self, origins, dirs, n_probe=64):
        """Per-ray [near, far] span over occupied space (vectorized probe
        march; replaces kaolin unbatched_raytrace + the mycuda postprocess,
        Utils.py:962-993)."""
        near_box, far_box = ray_box_intersect(origins, dirs)
        ts = jnp.linspace(0.0, 1.0, n_probe)[None]  # (1,P)
        t = near_box[:, None] + (far_box - near_box)[:, None] * ts  # (N,P)
        pts = origins[:, None] + dirs[:, None] * t[..., None]
        occ = self.query(pts)  # (N,P)
        big = jnp.float32(1e9)
        t_occ_min = jnp.min(jnp.where(occ, t, big), axis=1)
        t_occ_max = jnp.max(jnp.where(occ, t, -big), axis=1)
        any_occ = occ.any(axis=1)
        pad = self.vox_size  # half-voxel safety margin each side
        near = jnp.where(any_occ, jnp.maximum(t_occ_min - pad, 0.0), near_box)
        far = jnp.where(any_occ, t_occ_max + pad, far_box)
        return near, far
