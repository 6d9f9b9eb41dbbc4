"""AOT executable serialization experiment (VERDICT r4 item 3).

Cold start is bounded by server-side XLA compiles: the axon remote-compile
endpoint does not read or populate the local persistent jit cache
(/tmp/jax_compile_cache gains no TPU entries — r4 finding), so every fresh
process pays the full compile for the track (~40 s) and fused register
(~minutes) programs, and `first_pose_from_process_start_s` sits at ~100 s.

This experiment tests whether `jax.experimental.serialize_executable`
(pickle of the compiled PJRT executable) can turn compiled programs into a
disk artifact a fresh process can load WITHOUT a server round trip:

  stage A (this process): compile a probe fn + the real track program,
    serialize both to /tmp/aot_probe/, record sizes + timings;
  stage B (--load, fresh process): deserialize, run, compare against a
    freshly-jitted reference, record load time.

Run:  python tools/exp_aot.py         # compile + serialize + spawn loader
      python tools/exp_aot.py --load  # loader stage only
Writes AOT_EXPERIMENT.json at the repo root with the verdict.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT_DIR = "/tmp/aot_probe"
RESULT = os.path.join(REPO, "AOT_EXPERIMENT.json")


def _probe_fn():
    import jax.numpy as jnp

    def f(x, y):
        return jnp.tanh(x @ y) + x[:, :1]

    return f


def _track_lowered():
    """Lower the REAL track program exactly as the app compiles it."""
    import jax
    import jax.numpy as jnp

    from sixdof_tpu.estimater import FoundationPose
    from sixdof_tpu.io.mesh_io import load_mesh
    from sixdof_tpu.models.predict import PoseRefinePredictor, ScorePredictor, track_pose_jit

    scene = os.path.join(REPO, "demo_data", "synth_box")
    mesh = load_mesh(f"{scene}/mesh/model_scaled_down.obj")
    rck = os.path.join(REPO, "weights", "refiner")
    ref = PoseRefinePredictor(ckpt_dir=rck if os.path.exists(rck) else None)
    est = FoundationPose(model_pts=mesh.vertices, model_normals=mesh.vertex_normals,
                         mesh=mesh, refiner=ref, scorer=ScorePredictor(), prune_to=64)
    H = W = 192  # the track_crop session window at 288p
    sd = jax.ShapeDtypeStruct
    f32 = jnp.float32
    lowered = track_pose_jit.lower(
        ref.model, ref.params, est.mesh_tensors,
        sd((1, 4, 4), f32), sd((H, W, 5), jnp.uint8), sd((3, 3), f32),
        *est._register_scalar_args(),
        iterations=2, out_hw=tuple(ref.cfg["input_resize"]),
        normalize_xyz=bool(ref.cfg["normalize_xyz"]),
        trans_rep=ref.cfg["trans_rep"], rot_rep=ref.cfg["rot_rep"],
        backface_cull=est.backface_cull,
        occ_sub=ref.cfg.get("occ_sub", False),
    )
    return lowered


def stage_compile():
    os.makedirs(OUT_DIR, exist_ok=True)
    import pickle

    import jax
    import jax.numpy as jnp
    from jax.experimental import serialize_executable as se

    res = {"backend": jax.devices()[0].platform, "device": str(jax.devices()[0])}

    # --- tiny probe ---
    f = jax.jit(_probe_fn())
    x = jnp.ones((128, 128), jnp.float32)
    t0 = time.perf_counter()
    comp = f.lower(x, x).compile()
    res["probe_compile_s"] = round(time.perf_counter() - t0, 3)
    try:
        t0 = time.perf_counter()
        payload, in_tree, out_tree = se.serialize(comp)
        res["probe_serialize_s"] = round(time.perf_counter() - t0, 3)
        with open(os.path.join(OUT_DIR, "probe.pkl"), "wb") as fh:
            pickle.dump((payload, in_tree, out_tree), fh)
        res["probe_bytes"] = os.path.getsize(os.path.join(OUT_DIR, "probe.pkl"))
        res["probe_serialized"] = True
    except Exception as e:
        res["probe_serialized"] = False
        res["probe_error"] = f"{type(e).__name__}: {e}"

    # --- the real track program ---
    if res.get("probe_serialized"):
        try:
            t0 = time.perf_counter()
            lowered = _track_lowered()
            comp = lowered.compile()
            res["track_compile_s"] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            payload, in_tree, out_tree = se.serialize(comp)
            with open(os.path.join(OUT_DIR, "track.pkl"), "wb") as fh:
                pickle.dump((payload, in_tree, out_tree), fh)
            res["track_serialize_s"] = round(time.perf_counter() - t0, 3)
            res["track_bytes"] = os.path.getsize(os.path.join(OUT_DIR, "track.pkl"))
            res["track_serialized"] = True
        except Exception as e:
            res["track_serialized"] = False
            res["track_error"] = f"{type(e).__name__}: {e}"
    return res


def stage_load():
    """Fresh process: deserialize + run the probe (and track if present)."""
    import pickle

    import jax
    import jax.numpy as jnp
    from jax.experimental import serialize_executable as se

    res = {}
    t_start = time.perf_counter()
    with open(os.path.join(OUT_DIR, "probe.pkl"), "rb") as fh:
        payload, in_tree, out_tree = pickle.load(fh)
    try:
        t0 = time.perf_counter()
        comp = se.deserialize_and_load(payload, in_tree, out_tree)
        res["probe_load_s"] = round(time.perf_counter() - t0, 3)
        x = jnp.ones((128, 128), jnp.float32)
        t0 = time.perf_counter()
        out = comp(x, x)
        got = float(jnp.sum(out))
        res["probe_run_s"] = round(time.perf_counter() - t0, 3)
        want = float(jnp.sum(jax.jit(_probe_fn())(x, x)))
        res["probe_matches"] = bool(abs(got - want) < 1e-3 * max(1.0, abs(want)))
        res["probe_loaded"] = True
    except Exception as e:
        res["probe_loaded"] = False
        res["probe_load_error"] = f"{type(e).__name__}: {e}"
    track_pkl = os.path.join(OUT_DIR, "track.pkl")
    if res.get("probe_loaded") and os.path.exists(track_pkl):
        try:
            with open(track_pkl, "rb") as fh:
                payload, in_tree, out_tree = pickle.load(fh)
            t0 = time.perf_counter()
            comp = se.deserialize_and_load(payload, in_tree, out_tree)
            res["track_load_s"] = round(time.perf_counter() - t0, 3)
            res["track_loaded"] = True
        except Exception as e:
            res["track_loaded"] = False
            res["track_load_error"] = f"{type(e).__name__}: {e}"
    res["fresh_process_total_s"] = round(time.perf_counter() - t_start, 3)
    return res


def main():
    if "--load" in sys.argv:
        print(json.dumps(stage_load()))
        return
    res = stage_compile()
    if res.get("probe_serialized"):
        r = subprocess.run([sys.executable, os.path.abspath(__file__), "--load"],
                           capture_output=True, text=True, timeout=900)
        for line in reversed(r.stdout.strip().splitlines()):
            if line.startswith("{"):
                res["load_stage"] = json.loads(line)
                break
        else:
            res["load_stage"] = {"error": r.stderr[-2000:]}
    with open(RESULT, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
