"""Registration diagnostics: refiner convergence basin + hypothesis ranking.

Measures (a) how far the trained refiner pulls perturbed-GT poses back over
5 iterations, (b) the refined rotation-grid's best achievable accuracy, and
(c) where the scorer ranks the truly-best hypothesis.  Run on TPU after
tools/train_networks.py.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("EVAL_CPU"):  # CPU probes while the TPU is busy
    from sixdof_tpu.utils import force_cpu

    force_cpu()
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from sixdof_tpu.estimater import FoundationPose
from sixdof_tpu.io.mesh_io import load_mesh
from sixdof_tpu.io.readers import DataReader
from sixdof_tpu.metrics import adds_err, add_err, rotation_angle_deg
from sixdof_tpu.models.predict import PoseRefinePredictor, ScorePredictor, refine_poses_jit
from sixdof_tpu.ops.geometry import depth2xyzmap
from sixdof_tpu.ops.lie import euler_matrix

class Args: debug=0; box=None; mesh=None; voxel_size=None
SCENE=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'demo_data',
                   sys.argv[1] if len(sys.argv) > 1 else 'synth_box')
reader = DataReader(base_dir=SCENE, shorter_side=None, zfar=np.inf, arguments=Args())
mesh = load_mesh(f'{SCENE}/mesh/model_scaled_down.obj')
WDIR = os.environ.get('WEIGHTS_DIR', 'weights')
ref = PoseRefinePredictor(ckpt_dir=os.path.join(os.path.dirname(SCENE), '..', WDIR, 'refiner'))
sc = ScorePredictor(ckpt_dir=os.path.join(os.path.dirname(SCENE), '..', WDIR, 'scorer'))
est = FoundationPose(model_pts=mesh.vertices, model_normals=mesh.vertex_normals, mesh=mesh, refiner=ref, scorer=sc)
model_pts = np.asarray(est.pts)

color = reader.get_color(0); depth = reader.get_depth(0)
gt = reader.get_gt_pose(0)
gt_centered = gt.copy(); gt_centered[:3,3] = (gt @ np.linalg.inv(est.get_tf_to_centered_mesh()))[:3,3]
# centered-mesh gt pose: pose_c with pose_c @ tf_to_center = gt  ->  pose_c = gt @ inv(tf)
pose_c_gt = gt @ np.linalg.inv(est.get_tf_to_centered_mesh())

from sixdof_tpu.ops.depth_filter import preprocess_depth
depth_f = preprocess_depth(jnp.asarray(depth, dtype=jnp.float32))
xyz_map = depth2xyzmap(depth_f, jnp.asarray(reader.color_K, dtype=jnp.float32))
rgb01 = jnp.asarray(color, dtype=jnp.float32)/255.0
K = jnp.asarray(reader.color_K, dtype=jnp.float32)

OCC_SUB = bool(int(os.environ.get("OCC_SUB", "0")))  # A/B the visibility substitution

def refine(poses, iters):
    return np.asarray(refine_poses_jit(ref.model, ref.params, est.mesh_tensors,
        jnp.asarray(poses, dtype=jnp.float32), rgb01, xyz_map, K,
        float(est.diameter), 1.2, 0.02, 0.3490658503988659, iterations=iters,
        occ_sub=OCC_SUB))

# --- basin test: perturb gt by known angles
print("=== refiner basin (rot_err before -> after 5 iters) ===")
for deg in [5, 10, 20, 30, 45]:
    perts = []
    rng = np.random.RandomState(deg)
    for _ in range(8):
        ax = rng.randn(3); ax = ax/np.linalg.norm(ax)*np.deg2rad(deg)
        dR = np.eye(4); 
        from sixdof_tpu.ops.lie import so3_exp_map
        dR[:3,:3] = np.asarray(so3_exp_map(jnp.asarray(ax[None])))[0]
        p = pose_c_gt.copy(); p[:3,:3] = dR[:3,:3] @ p[:3,:3]
        p[:3,3] += rng.uniform(-0.01,0.01,3)
        perts.append(p)
    out = refine(np.stack(perts), 5)
    errs = [rotation_angle_deg(o[:3,:3], pose_c_gt[:3,:3]) for o in out]
    terrs = [np.linalg.norm(o[:3,3]-pose_c_gt[:3,3])*1000 for o in out]
    print(f"  {deg:3d}deg -> rot after: med {np.median(errs):.1f} max {np.max(errs):.1f} | t med {np.median(terrs):.1f}mm")

# --- ranking test: refine the full grid, look at true quality vs rank
mask = reader.get_mask(color, 0).astype(bool)
center = est.guess_translation(depth=np.asarray(depth_f), mask=mask, K=reader.color_K)
poses0 = est.rot_grid.copy(); poses0[:, :3, 3] = center
refined = refine(poses0, 5)
adds = np.array([adds_err(p, pose_c_gt, model_pts) for p in refined])
rots = np.array([rotation_angle_deg(p[:3,:3], pose_c_gt[:3,:3]) for p in refined])
print("=== refined grid quality ===")
print(f"  best ADD-S: {adds.min()*1000:.2f}mm (idx {adds.argmin()}), best rot: {rots.min():.1f}deg")
print(f"  # hyps with rot<10deg: {(rots<10).sum()}, <20deg: {(rots<20).sum()}")

scores, _ = sc.predict(mesh=est.mesh, rgb=color, depth=depth_f, K=reader.color_K,
                       ob_in_cams=refined, mesh_tensors=est.mesh_tensors, mesh_diameter=est.diameter)
scores = np.asarray(scores)
order = np.argsort(-scores)
print("=== ranking (hybrid) ===")
for r in range(5):
    i = order[r]
    print(f"  rank{r}: idx {i} score {scores[i]:.3f} ADD-S {adds[i]*1000:.2f}mm rot {rots[i]:.1f}deg")
print(f"  rank of true-best hyp: {list(order).index(int(adds.argmin()))}")
