"""FLOP accounting for the hot pipeline programs (VERDICT r2 item 3).

Counts the XLA-estimated FLOPs of the two production dispatches — the fused
register cascade and the fused track step — at the bench shapes, by lowering
the exact call the estimator's AOT path lowers and
running HLO cost analysis.  No TPU needed: lowering is backend-independent
tracing, so this runs on the CPU backend in seconds and writes FLOPS.json,
which bench.py folds into MFU fields (measured seconds / counted FLOPs vs
the chip's peak).

Usage: python tools/flops_report.py [scene_dir]
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sixdof_tpu.utils import force_cpu  # noqa: E402

force_cpu()  # tracing/cost analysis only — never occupy the TPU for this


def _flops_of(jit_fn, args, kwargs):
    lowered = jit_fn.lower(*args, **kwargs)
    cost = lowered.cost_analysis()
    if isinstance(cost, list):  # older jax returns one entry per device
        cost = cost[0]
    if not cost or "flops" not in cost:
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
    return float(cost["flops"]), {
        k: float(v) for k, v in cost.items()
        if k in ("flops", "transcendentals", "bytes accessed")
    }


def main(scene_dir=None, shorter_side=288):
    import logging

    logging.disable(logging.INFO)
    scene_dir = scene_dir or os.path.join(REPO, "demo_data", "synth_box")

    from sixdof_tpu import estimater as est_mod
    from sixdof_tpu.estimater import FoundationPose
    from sixdof_tpu.io.mesh_io import load_mesh
    from sixdof_tpu.io.readers import DataReader
    from sixdof_tpu.models import predict
    from sixdof_tpu.models.predict import PoseRefinePredictor, ScorePredictor

    class Args:
        debug = 0
        box = None
        mesh = None
        voxel_size = None

    reader = DataReader(base_dir=scene_dir, shorter_side=shorter_side, zfar=np.inf,
                        arguments=Args())
    mesh = load_mesh(f"{scene_dir}/mesh/model_scaled_down.obj")
    rckpt, sckpt = os.path.join(REPO, "weights", "refiner"), os.path.join(REPO, "weights", "scorer")
    est = FoundationPose(
        model_pts=mesh.vertices, model_normals=mesh.vertex_normals, mesh=mesh,
        refiner=PoseRefinePredictor(ckpt_dir=rckpt if os.path.exists(rckpt) else None),
        scorer=ScorePredictor(ckpt_dir=sckpt if os.path.exists(sckpt) else None),
        prune_to=64,  # bench.py's configuration
    )

    color = reader.get_color(0)
    depth = reader.get_depth(0)
    mask = reader.get_mask(color, 0).astype(bool)

    out = {"scene": os.path.basename(scene_dir), "shorter_side": shorter_side,
           "prune_to": 64, "n_hypotheses": int(len(est.rot_grid))}

    # ---- register cascade: build the exact fused-call args the estimater's
    # AOT path lowers (the old monkeypatch-capture broke once register()
    # started calling compiled executables directly) ----
    import jax.numpy as _jnp

    from sixdof_tpu.models.predict import pack_rgbd, to_rgb01
    from sixdof_tpu.ops.depth_filter import bilateral_filter_depth, erode_depth

    depth_f = bilateral_filter_depth(
        erode_depth(_jnp.asarray(depth, _jnp.float32), radius=2), radius=2)
    hypo = est.generate_random_pose_hypo(K=reader.color_K, rgb=color,
                                         depth=np.asarray(depth_f), mask=mask)
    reg_args = (est.refiner.model, est.refiner.params, est.scorer.model,
                est.scorer.params, est.mesh_tensors,
                _jnp.asarray(hypo, _jnp.float32), to_rgb01(color), depth_f,
                _jnp.asarray(reader.color_K, _jnp.float32),
                *est._register_scalar_args())
    flops, detail = _flops_of(predict.register_pipeline_jit, reg_args,
                              est._register_pipeline_kwargs(5))
    out["register_flops"] = flops
    out["register_cost"] = detail

    # ---- track step (full-frame shape, the bench's steady-state program) --
    rgb_u8 = np.ascontiguousarray(color.astype(np.uint8))
    d_u16 = np.clip(np.asarray(depth) * 1000.0, 0, 65535).astype(np.uint16)
    rgbd = pack_rgbd(rgb_u8, np.ascontiguousarray(d_u16))
    ref = est.refiner
    track_args = (ref.model, ref.params, est.mesh_tensors,
                  _jnp.zeros((1, 4, 4), _jnp.float32), _jnp.asarray(rgbd),
                  _jnp.asarray(reader.color_K, _jnp.float32),
                  *est._register_scalar_args())
    track_kwargs = dict(iterations=2, out_hw=tuple(ref.cfg["input_resize"]),
                        normalize_xyz=bool(ref.cfg["normalize_xyz"]),
                        trans_rep=ref.cfg["trans_rep"], rot_rep=ref.cfg["rot_rep"],
                        backface_cull=est.backface_cull,
                        occ_sub=ref.cfg.get("occ_sub", False),
                        **est._track_polish_kwargs())
    flops, detail = _flops_of(predict.track_pose_jit, track_args, track_kwargs)
    out["track_flops"] = flops
    out["track_cost"] = detail

    # ---- per-stage split of the register cascade (VERDICT r3 item 8):
    # lower each stage of the default bench cascade — 2 coarse refine iters
    # over the full grid at coarse_hw, coarse score, prune to 64, 3 fine
    # refine iters at 160, fine score — separately, so the warm register
    # wall-clock has an attribution and the MFU number a per-stage
    # denominator.  Stage args mirror register_pipeline_jit's internal calls.
    import jax.numpy as jnp

    from sixdof_tpu.models.predict import refine_poses_jit, score_poses_jit
    from sixdof_tpu.ops.geometry import depth2xyzmap

    ref, sc = est.refiner, est.scorer
    n_hypo = int(len(est.rot_grid))
    diam = float(est.diameter)
    K_j = jnp.asarray(reader.color_K, jnp.float32)
    rgb01 = jnp.asarray(color, jnp.float32) / 255.0
    xyz_map = depth2xyzmap(jnp.asarray(depth, jnp.float32), K_j)
    marr = est.mesh_tensors
    bc = bool(est.backface_cull)
    chw = est.coarse_hw or (160, 160)
    fhw = tuple(ref.cfg["input_resize"])
    shw = tuple(sc.cfg["input_resize"])

    def _poses(k):
        p = np.tile(np.eye(4, dtype=np.float32)[None], (k, 1, 1))
        p[:, 2, 3] = 0.55
        return jnp.asarray(p)

    def _refine_stage(k, iters, hw):
        return _flops_of(
            refine_poses_jit,
            (ref.model, ref.params, marr, _poses(k), rgb01, xyz_map, K_j, diam,
             float(ref.cfg["crop_ratio"]), float(ref.cfg["trans_normalizer"]),
             float(ref.cfg["rot_normalizer"]), iters),
            dict(out_hw=hw, normalize_xyz=bool(ref.cfg["normalize_xyz"]),
                 trans_rep=ref.cfg["trans_rep"], rot_rep=ref.cfg["rot_rep"],
                 backface_cull=bc, occ_sub=bool(ref.cfg.get("occ_sub", False))))

    def _score_stage(k, hw):
        return _flops_of(
            score_poses_jit,
            (sc.model, sc.params, marr, _poses(k), rgb01, xyz_map, K_j, diam,
             float(sc.cfg["crop_ratio"])),
            dict(out_hw=hw, normalize_xyz=bool(sc.cfg["normalize_xyz"]),
                 mode=sc.cfg.get("score_mode", "hybrid"), backface_cull=bc))

    stages = {}
    for name, (fl, detail) in (
        ("coarse_refine_2it_full_grid", _refine_stage(n_hypo, 2, chw)),
        ("coarse_score_full_grid", _score_stage(n_hypo, chw)),
        ("fine_refine_3it_top64", _refine_stage(64, 3, fhw)),
        ("fine_score_top64", _score_stage(64, shw)),
    ):
        stages[name] = {"flops": fl, **detail}
    out["register_stages"] = stages
    out["register_stage_sum_flops"] = sum(s["flops"] for s in stages.values())

    path = os.path.join(REPO, "FLOPS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
