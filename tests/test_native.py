"""Native C++ runtime kernels vs the pure-python fallbacks."""
import subprocess
import os

import numpy as np
import pytest

from sixdof_tpu import native

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        subprocess.run([os.path.join(REPO, "native", "build.sh")], check=True)
        native._TRIED = False  # re-probe
    assert native.available()


def test_cluster_poses_matches_python(rng):
    from sixdof_tpu.ops.hypotheses import sample_views_icosphere
    from sixdof_tpu.ops.lie import euler_matrix

    cams = sample_views_icosphere(40)
    poses = []
    for c in cams:
        for r in np.deg2rad([0, 60, 120, 180, 240, 300]):
            poses.append(np.linalg.inv(c @ euler_matrix(0, 0, r)))
    poses = np.asarray(poses)
    sym = np.eye(4)[None]

    native_out = native.cluster_poses(30.0, 99999.0, poses, sym)

    # python reference (inline, to bypass the native dispatch)
    radian_thres = np.deg2rad(30.0)
    kept = [poses[0]]
    for i in range(1, len(poses)):
        cur = poses[i]
        K = np.stack(kept)
        t_close = np.linalg.norm(K[:, :3, 3] - cur[:3, 3], axis=-1) < 99999.0
        cur_rots = (cur[None] @ sym)[:, :3, :3]
        m = np.einsum("sij,mkj->msik", cur_rots, K[:, :3, :3])
        cos = np.clip((np.trace(m, axis1=-2, axis2=-1) - 1) / 2, -1, 1)
        rot_close = (np.arccos(cos) < radian_thres).any(axis=-1)
        if not (t_close & rot_close).any():
            kept.append(cur)
    py_out = np.stack(kept)

    assert len(native_out) == len(py_out)
    np.testing.assert_allclose(native_out, py_out, atol=1e-6)


def test_dbscan_matches_clusters(rng):
    a = rng.randn(300, 3) * 2
    b = rng.randn(120, 3) * 2 + np.array([50, 0, 0])
    noise = np.array([[200.0, 200, 200]])
    pts = np.concatenate([a, b, noise])
    labels = native.dbscan_labels(pts, eps=5.0, min_points=5)
    assert labels[-1] == -1  # isolated point = noise
    la = labels[:300]
    lb = labels[300:420]
    assert len(set(la.tolist())) == 1 and la[0] != -1
    assert len(set(lb.tolist())) == 1 and lb[0] != -1
    assert la[0] != lb[0]


def test_has_neighbor_within(rng):
    ref = rng.rand(500, 3) * 100
    near = ref[:50] + rng.randn(50, 3) * 0.1
    far = rng.rand(50, 3) * 100 + 500
    out = native.has_neighbor_within(np.concatenate([near, far]), ref, 5.0)
    assert out[:50].all()
    assert not out[50:].any()
