"""Reference-format H5 pose-pair dataset ingest.

Reads the training-data layout of the reference's
``learning/datasets/h5_dataset.py`` (:20-219): one top-level group per
object key, each holding ``i_perturb``-indexed subgroups whose image fields
(``rgbA``/``rgbB``/``depthA``/``depthB``) are stored as PNG-encoded byte
blobs, plus per-file scalars ``crop_ratio``, ``H_ori``/``W_ori``,
``trans_normalizer``/``rot_normalizer``.  An optional ``<file>_keys.pkl``
sidecar pre-lists the object keys (h5_dataset.py:36-42).

Decoded samples land in the :class:`~sixdof_tpu.models.pose_data.PoseData`
/ ``BatchPoseData`` containers; ``transform_batch`` reproduces the
reference's normalization semantics (rgb/255, depth -> xyz map recentred at
poseA's translation, radius-normalized with the |xyz|>=2 invalid mask,
h5_dataset.py:80-129) with JAX ops instead of kornia warps.

The reference's actual training H5 files are unpublished; ``write_pair_h5``
emits the same layout so the TPU trainer's synthetic pairs can round-trip
through this reader (and so tests can cover it).
"""
from __future__ import annotations

import io
import os
import pickle
from typing import List, Optional, Sequence

import numpy as np

try:  # pragma: no cover - h5py is in the image, but stay import-safe
    import h5py

    HAVE_H5PY = True
except Exception:  # pragma: no cover
    h5py = None
    HAVE_H5PY = False

from ..models.pose_data import BatchPoseData, PoseData


def _encode_png(arr: np.ndarray) -> bytes:
    """PNG-encode an image array (uint8 RGB or uint16 depth-mm)."""
    import imageio.v2 as imageio

    buf = io.BytesIO()
    imageio.imwrite(buf, arr, format="png")
    return buf.getvalue()


def _decode_image(blob) -> np.ndarray:
    """Decode a PNG byte blob stored as an h5 scalar (h5_dataset.py:199-200)."""
    import imageio.v2 as imageio

    raw = np.asarray(blob).tobytes() if not isinstance(blob, bytes) else blob
    return np.asarray(imageio.imread(io.BytesIO(raw)))


class PairH5Dataset:
    """Pose-pair H5 reader (reference h5_dataset.py:20-129).

    Parameters mirror the reference: ``mode='test'`` constructs a transform-
    only instance bound to no file (predict_pose_refine.py:134), otherwise
    object keys are enumerated from the ``_keys.pkl`` sidecar or the file
    itself, truncated to ``max_num_key``.
    """

    DEPTH_SCALE = 1000.0  # depths stored as uint16 millimetres

    def __init__(self, cfg: Optional[dict] = None, h5_file: str = "",
                 mode: str = "train", max_num_key: Optional[int] = None):
        self.cfg = dict(cfg) if cfg else {}
        self.cfg.setdefault("normalize_xyz", True)
        self.h5_file = h5_file
        self.mode = mode
        self.n_perturb = None
        self.H_ori = None
        self.W_ori = None
        self.trans_normalizer = None
        self.rot_normalizer = None
        self.object_keys: List[str] = []

        if mode == "test" or not h5_file:
            return
        if not HAVE_H5PY:  # pragma: no cover
            raise ImportError("h5py is required to read pose-pair H5 files")

        key_file = h5_file.replace(".h5", "_keys.pkl")
        if os.path.exists(key_file):
            with open(key_file, "rb") as ff:
                self.object_keys = list(pickle.load(ff))
            if max_num_key is not None:
                self.object_keys = self.object_keys[:max_num_key]
        else:
            with h5py.File(h5_file, "r", libver="latest") as hf:
                for k in hf:
                    self.object_keys.append(k)
                    if max_num_key is not None and len(self.object_keys) >= max_num_key:
                        break

        with h5py.File(h5_file, "r", libver="latest") as hf:
            group = hf[self.object_keys[0]]
            cnt = 0
            for k_perturb in group:
                sub = group[k_perturb]
                if "i_perturb" in k_perturb:
                    cnt += 1
                if "crop_ratio" in sub:
                    self.cfg["crop_ratio"] = float(sub["crop_ratio"][()])
                if self.H_ori is None:
                    if "H_ori" in sub:
                        self.H_ori = int(sub["H_ori"][()])
                        self.W_ori = int(sub["W_ori"][()])
                    else:  # reference default (h5_dataset.py:64-66)
                        self.H_ori, self.W_ori = 540, 720
                if "trans_normalizer" in sub and self.trans_normalizer is None:
                    tn = sub["trans_normalizer"][()]
                    self.trans_normalizer = tn.tolist() if isinstance(tn, np.ndarray) else float(tn)
                if "rot_normalizer" in sub and self.rot_normalizer is None:
                    self.rot_normalizer = float(sub["rot_normalizer"][()]) / 180.0 * np.pi
            self.n_perturb = cnt

    def __len__(self):
        return 1 if self.mode == "test" else len(self.object_keys)

    # -- sample / batch loading ------------------------------------------

    def load_sample(self, key: str, i_perturb: int = 0) -> PoseData:
        """Decode one perturbation of one object key into a PoseData."""
        with h5py.File(self.h5_file, "r", libver="latest") as hf:
            sub = hf[key][f"i_perturb{i_perturb}"]
            s = PoseData(
                rgbA=_decode_image(sub["rgbA"][()]),
                rgbB=_decode_image(sub["rgbB"][()]),
                depthA=_decode_image(sub["depthA"][()]).astype(np.float32) / self.DEPTH_SCALE,
                depthB=_decode_image(sub["depthB"][()]).astype(np.float32) / self.DEPTH_SCALE,
                poseA=np.asarray(sub["poseA"][()], np.float32) if "poseA" in sub else None,
                poseB=np.asarray(sub["poseB"][()], np.float32) if "poseB" in sub else None,
                K=np.asarray(sub["K"][()], np.float32) if "K" in sub else None,
                mesh_diameter=float(sub["mesh_diameter"][()]) if "mesh_diameter" in sub else None,
                tf_to_crop=np.asarray(sub["tf_to_crop"][()], np.float32) if "tf_to_crop" in sub else None,
                target=float(sub["target"][()]) if "target" in sub else None,
            )
        return s

    def load_batch(self, keys: Sequence[str], i_perturb: int = 0) -> BatchPoseData:
        """Stack samples (one per key) into a BatchPoseData."""
        samples = [self.load_sample(k, i_perturb) for k in keys]

        def stack(field):
            vals = [getattr(s, field) for s in samples]
            if any(v is None for v in vals):
                return None
            return np.stack([np.asarray(v) for v in vals], axis=0)

        return BatchPoseData(
            rgbAs=stack("rgbA"), rgbBs=stack("rgbB"),
            depthAs=stack("depthA"), depthBs=stack("depthB"),
            poseA=stack("poseA"), poseB=stack("poseB"),
            Ks=stack("K"), tf_to_crops=stack("tf_to_crop"),
            mesh_diameters=stack("mesh_diameter"),
            labels=stack("target"),
        )

    # -- normalization transforms ----------------------------------------

    _INVALID_Z = 0.001  # PairH5Dataset threshold (h5_dataset.py:97)

    def _depth_to_xyz_crop(self, depths, batch: BatchPoseData, H_ori, W_ori):
        """Depth crops -> xyz-map crops via un-warp to the original frame.

        Mirrors the kornia warp round-trip (h5_dataset.py:92-95): depth crops
        are nearest-unwarped to (H_ori, W_ori), lifted with K, then
        re-warped to the crop.  Uses our separable interp-matrix warp.
        """
        import jax
        import jax.numpy as jnp

        from ..ops.geometry import depth2xyzmap_batch
        from ..ops.warp import warp_perspective

        H, W = depths.shape[-2], depths.shape[-1]
        tf = jnp.asarray(batch.tf_to_crops, jnp.float32)
        crop_to_ori = jnp.linalg.inv(tf)
        unwarp = jax.vmap(lambda im, t: warp_perspective(im, t[None], (H_ori, W_ori), mode="nearest")[0])
        d_ori = unwarp(jnp.asarray(depths, jnp.float32), crop_to_ori)
        xyz = depth2xyzmap_batch(d_ori, jnp.asarray(batch.Ks, jnp.float32))
        rewarp = jax.vmap(lambda im, t: warp_perspective(im, t[None], (H, W), mode="nearest")[0])
        return rewarp(xyz, tf)  # (B,H,W,3)

    def _recentre(self, xyz, batch: BatchPoseData, invalid_z: float):
        import jax.numpy as jnp

        bs = xyz.shape[0]
        poseA = jnp.asarray(batch.poseA, jnp.float32)
        invalid = xyz[..., 2:3] < invalid_z
        xyz = xyz - poseA[:, :3, 3].reshape(bs, 1, 1, 3)
        if self.cfg.get("normalize_xyz", True):
            radius = jnp.asarray(batch.mesh_diameters, jnp.float32).reshape(bs, 1, 1, 1) / 2.0
            xyz = xyz / radius
            # per-channel zeroing, matching the reference's expanded mask
            # (h5_dataset.py:101-103): |c|>=2 zeroes that channel only.
            invalid = invalid | (jnp.abs(xyz) >= 2)
            xyz = jnp.where(invalid, 0.0, xyz)
        return xyz

    def transform_batch(self, batch: BatchPoseData, H_ori: int, W_ori: int,
                        bound: int = 1) -> BatchPoseData:
        """rgb/255 + depth->xyz recentring (h5_dataset.py:119-127)."""
        import jax.numpy as jnp

        batch.rgbAs = jnp.asarray(batch.rgbAs, jnp.float32) / 255.0
        batch.rgbBs = jnp.asarray(batch.rgbBs, jnp.float32) / 255.0
        if batch.xyz_mapAs is None:
            batch.xyz_mapAs = self._depth_to_xyz_crop(batch.depthAs, batch, H_ori, W_ori)
        if batch.xyz_mapBs is None:
            batch.xyz_mapBs = self._depth_to_xyz_crop(batch.depthBs, batch, H_ori, W_ori)
        batch.xyz_mapAs = self._recentre(jnp.asarray(batch.xyz_mapAs, jnp.float32),
                                         batch, self._INVALID_Z)
        batch.xyz_mapBs = self._recentre(jnp.asarray(batch.xyz_mapBs, jnp.float32),
                                         batch, self._INVALID_Z)
        return batch


class TripletH5Dataset(PairH5Dataset):
    """Scorer-side variant: looser invalid-z (0.1) applied unconditionally
    before recentring (h5_dataset.py:152-170)."""

    _INVALID_Z = 0.1


class ScoreMultiPairH5Dataset(TripletH5Dataset):
    """Multi-pair scorer dataset: train_num_pair tracks n_perturb
    (h5_dataset.py:185-189)."""

    def __init__(self, cfg=None, h5_file="", mode="train", max_num_key=None):
        super().__init__(cfg=cfg, h5_file=h5_file, mode=mode, max_num_key=max_num_key)
        if mode in ("train", "val") and self.n_perturb:
            self.cfg["train_num_pair"] = self.n_perturb


class PoseRefinePairH5Dataset(PairH5Dataset):
    """Refiner dataset: derives n_view from the concatenated depthA strip and
    loads the trans/rot normalizers (h5_dataset.py:192-214)."""

    def __init__(self, cfg=None, h5_file="", mode="train", max_num_key=None):
        super().__init__(cfg=cfg, h5_file=h5_file, mode=mode, max_num_key=max_num_key)
        if mode != "test" and self.object_keys:
            with h5py.File(self.h5_file, "r", libver="latest") as hf:
                group = hf[self.object_keys[0]]
                for key_perturb in group:
                    sub = group[key_perturb]
                    depthA = _decode_image(sub["depthA"][()])
                    depthB = _decode_image(sub["depthB"][()])
                    n_view = max(1, depthA.shape[1] // max(1, depthB.shape[1]))
                    self.cfg["n_view"] = min(self.cfg.get("n_view", n_view), n_view)
                    break


def write_pair_h5(h5_file: str, samples: dict, crop_ratio: float = 1.2,
                  H_ori: int = 540, W_ori: int = 720,
                  trans_normalizer=(0.02, 0.02, 0.05),
                  rot_normalizer_deg: float = 20.0,
                  write_keys_pkl: bool = False) -> None:
    """Emit the reference H5 layout from in-memory samples.

    ``samples`` maps object-key -> list of PoseData (one per perturbation).
    Depths are stored as uint16 mm PNGs, rgb as uint8 PNGs, matching what the
    reference's loader decodes (h5_dataset.py:199-200).
    """
    if not HAVE_H5PY:  # pragma: no cover
        raise ImportError("h5py is required to write pose-pair H5 files")
    with h5py.File(h5_file, "w", libver="latest") as hf:
        for key, plist in samples.items():
            g = hf.create_group(str(key))
            for i, s in enumerate(plist):
                sub = g.create_group(f"i_perturb{i}")
                sub["rgbA"] = np.void(_encode_png(np.asarray(s.rgbA, np.uint8)))
                sub["rgbB"] = np.void(_encode_png(np.asarray(s.rgbB, np.uint8)))
                dA = np.round(np.asarray(s.depthA, np.float32) * PairH5Dataset.DEPTH_SCALE)
                dB = np.round(np.asarray(s.depthB, np.float32) * PairH5Dataset.DEPTH_SCALE)
                sub["depthA"] = np.void(_encode_png(dA.astype(np.uint16)))
                sub["depthB"] = np.void(_encode_png(dB.astype(np.uint16)))
                sub["crop_ratio"] = float(crop_ratio)
                sub["H_ori"], sub["W_ori"] = int(H_ori), int(W_ori)
                sub["trans_normalizer"] = np.asarray(trans_normalizer, np.float32)
                sub["rot_normalizer"] = float(rot_normalizer_deg)
                for field in ("poseA", "poseB", "K", "tf_to_crop"):
                    v = getattr(s, field)
                    if v is not None:
                        sub[field] = np.asarray(v, np.float32)
                if s.mesh_diameter is not None:
                    sub["mesh_diameter"] = float(s.mesh_diameter)
                if s.target is not None:
                    sub["target"] = float(s.target)
    if write_keys_pkl:
        with open(h5_file.replace(".h5", "_keys.pkl"), "wb") as ff:
            pickle.dump(list(samples.keys()), ff)
