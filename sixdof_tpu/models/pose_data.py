"""Pose-pair batch containers (reference learning/datasets/pose_dataset.py).

`PoseData` / `BatchPoseData` mirror the reference dataclasses (:20-135) over
numpy/JAX arrays.  The jitted predictors consume plain arrays, so these exist
for API parity and for dataset tooling: `cuda()` becomes `device()`,
`pin_memory()` is a no-op (XLA manages transfers), `select_by_indices` is the
same gather the scorer tournament used (:129-134).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np


@dataclass
class PoseData:
    """Single sample (reference pose_dataset.py:20-63)."""

    rgbA: Optional[np.ndarray] = None
    rgbB: Optional[np.ndarray] = None
    depthA: Optional[np.ndarray] = None
    depthB: Optional[np.ndarray] = None
    maskA: Optional[np.ndarray] = None
    maskB: Optional[np.ndarray] = None
    normalA: Optional[np.ndarray] = None
    normalB: Optional[np.ndarray] = None
    xyz_mapA: Optional[np.ndarray] = None
    xyz_mapB: Optional[np.ndarray] = None
    poseA: Optional[np.ndarray] = None
    poseB: Optional[np.ndarray] = None
    K: Optional[np.ndarray] = None
    target: Optional[float] = None
    mesh_diameter: Optional[float] = None
    tf_to_crop: Optional[np.ndarray] = None
    crop_mask: Optional[np.ndarray] = None
    model_pts: Optional[np.ndarray] = None
    label: Optional[np.ndarray] = None
    model_scale: Optional[np.ndarray] = None


class BatchPoseData:
    """Batched pose-pair data (reference pose_dataset.py:66-135)."""

    def __init__(self, rgbAs=None, rgbBs=None, depthAs=None, depthBs=None, normalAs=None,
                 normalBs=None, maskAs=None, maskBs=None, poseA=None, poseB=None,
                 xyz_mapAs=None, xyz_mapBs=None, tf_to_crops=None, Ks=None,
                 crop_masks=None, model_pts=None, mesh_diameters=None, labels=None):
        self.rgbAs = rgbAs
        self.rgbBs = rgbBs
        self.depthAs = depthAs
        self.depthBs = depthBs
        self.normalAs = normalAs
        self.normalBs = normalBs
        self.poseA = poseA
        self.poseB = poseB
        self.maskAs = maskAs
        self.maskBs = maskBs
        self.xyz_mapAs = xyz_mapAs
        self.xyz_mapBs = xyz_mapBs
        self.tf_to_crops = tf_to_crops
        self.crop_masks = crop_masks
        self.Ks = Ks
        self.model_pts = model_pts
        self.mesh_diameters = mesh_diameters
        self.labels = labels

    def device(self):
        """Place every array on the default device (the `.cuda()` of :120-127)."""
        import jax.numpy as jnp

        for k, v in self.__dict__.items():
            if v is not None:
                try:
                    self.__dict__[k] = jnp.asarray(v)
                except Exception:
                    pass
        return self

    cuda = device  # reference-compatible alias

    def pin_memory(self):
        return self  # XLA manages host staging

    def select_by_indices(self, ids):
        out = BatchPoseData()
        ids = np.asarray(ids)
        for k, v in self.__dict__.items():
            if v is not None:
                out.__dict__[k] = v[ids]
        return out
