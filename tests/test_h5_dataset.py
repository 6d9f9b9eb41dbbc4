"""H5 pose-pair ingest: write the reference layout, read it back, and check
the transform_batch normalization semantics (reference h5_dataset.py:20-219).
"""
import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from sixdof_tpu.io.h5_dataset import (
    PairH5Dataset,
    PoseRefinePairH5Dataset,
    ScoreMultiPairH5Dataset,
    TripletH5Dataset,
    write_pair_h5,
)
from sixdof_tpu.models.pose_data import PoseData


def _make_sample(rng, H=32, W=32, z=0.8, diameter=0.2):
    rgbA = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    rgbB = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    depthA = np.full((H, W), z, np.float32)
    depthB = np.full((H, W), z, np.float32)
    depthB[:4] = 0.0  # invalid strip
    poseA = np.eye(4, dtype=np.float32)
    poseA[2, 3] = z
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32)
    tf = np.eye(3, dtype=np.float32)  # identity crop: crop == original frame
    return PoseData(rgbA=rgbA, rgbB=rgbB, depthA=depthA, depthB=depthB,
                    poseA=poseA, poseB=poseA.copy(), K=K, tf_to_crop=tf,
                    mesh_diameter=diameter, target=0.01)


@pytest.fixture(scope="module")
def h5_path(tmp_path_factory):
    rng = np.random.default_rng(0)
    path = str(tmp_path_factory.mktemp("h5") / "pairs.h5")
    samples = {
        "ob_0": [_make_sample(rng), _make_sample(rng)],
        "ob_1": [_make_sample(rng), _make_sample(rng)],
        "ob_2": [_make_sample(rng), _make_sample(rng)],
    }
    write_pair_h5(path, samples, crop_ratio=1.4, H_ori=32, W_ori=32,
                  write_keys_pkl=True)
    return path


def test_key_enumeration_and_metadata(h5_path):
    ds = PairH5Dataset(h5_file=h5_path, mode="train")
    assert ds.object_keys == ["ob_0", "ob_1", "ob_2"]  # from _keys.pkl
    assert len(ds) == 3
    assert ds.n_perturb == 2
    assert ds.cfg["crop_ratio"] == pytest.approx(1.4)
    assert (ds.H_ori, ds.W_ori) == (32, 32)
    assert ds.rot_normalizer == pytest.approx(np.deg2rad(20.0))

    capped = PairH5Dataset(h5_file=h5_path, mode="train", max_num_key=2)
    assert len(capped) == 2

    # without the sidecar, keys come from the file itself
    import os
    pkl = h5_path.replace(".h5", "_keys.pkl")
    os.rename(pkl, pkl + ".bak")
    try:
        ds2 = PairH5Dataset(h5_file=h5_path, mode="train")
        assert sorted(ds2.object_keys) == ["ob_0", "ob_1", "ob_2"]
    finally:
        os.rename(pkl + ".bak", pkl)


def test_test_mode_needs_no_file():
    ds = PairH5Dataset(h5_file="", mode="test")
    assert len(ds) == 1


def test_sample_roundtrip(h5_path):
    ds = PairH5Dataset(h5_file=h5_path, mode="train")
    s = ds.load_sample("ob_0", 0)
    assert s.rgbA.shape == (32, 32, 3) and s.rgbA.dtype == np.uint8
    np.testing.assert_allclose(s.depthA, 0.8, atol=1e-3)  # mm-quantized
    assert s.poseA[2, 3] == pytest.approx(0.8)
    assert s.mesh_diameter == pytest.approx(0.2)


def test_transform_batch_normalization(h5_path):
    ds = PairH5Dataset(h5_file=h5_path, mode="train")
    batch = ds.load_batch(ds.object_keys)
    batch = ds.transform_batch(batch, ds.H_ori, ds.W_ori)
    rgbAs = np.asarray(batch.rgbAs)
    assert rgbAs.max() <= 1.0 and rgbAs.min() >= 0.0
    xyzB = np.asarray(batch.xyz_mapBs)  # (B,H,W,3)
    assert xyzB.shape == (3, 32, 32, 3)
    # invalid strip (depth 0) must be zeroed after normalization
    np.testing.assert_array_equal(xyzB[:, :4], 0.0)
    # centre pixel: xyz == poseA translation -> recentred to ~0,
    # normalized by radius, and within the +-2 band (not zeroed spuriously)
    centre = xyzB[:, 16, 16]
    assert np.abs(centre).max() < 2.0
    assert np.abs(centre[:, :2]).max() < 0.2  # principal ray ~= optical axis
    # plane at z = poseA z -> z-channel ~0 after recentring
    assert np.abs(centre[:, 2]).max() < 0.05


def test_select_by_indices_through_container(h5_path):
    ds = PairH5Dataset(h5_file=h5_path, mode="train")
    batch = ds.load_batch(ds.object_keys)
    sub = batch.select_by_indices(np.array([2, 0]))
    np.testing.assert_array_equal(np.asarray(sub.rgbAs)[0], np.asarray(batch.rgbAs)[2])
    np.testing.assert_array_equal(np.asarray(sub.poseA)[1], np.asarray(batch.poseA)[0])


def test_refine_dataset_n_view_and_score_train_num_pair(h5_path):
    ref = PoseRefinePairH5Dataset(cfg={"n_view": 4}, h5_file=h5_path, mode="train")
    assert ref.cfg["n_view"] == 1  # depthA strip == depthB width -> 1 view
    sc = ScoreMultiPairH5Dataset(h5_file=h5_path, mode="train")
    assert sc.cfg["train_num_pair"] == 2
    assert TripletH5Dataset._INVALID_Z == pytest.approx(0.1)
