"""JET colormap without matplotlib/OpenCV, device- and host-usable.

Replaces matplotlib `cm.get_cmap('jet')` (reference defect_projection.py:290)
and cv2.COLORMAP_JET for defect-point coloring and overlays.
"""
from __future__ import annotations

import numpy as np


def jet_colormap(x):
    """Map values in [0,1] (any-shape numpy array) -> RGB in [0,1] (matplotlib
    'jet' piecewise-linear formula)."""
    x = np.clip(np.asarray(x, dtype=np.float64), 0.0, 1.0)

    def interp(v, points, vals):
        return np.interp(v, points, vals)

    # matplotlib jet segment data
    r = interp(x, [0.0, 0.35, 0.66, 0.89, 1.0], [0.0, 0.0, 1.0, 1.0, 0.5])
    g = interp(x, [0.0, 0.125, 0.375, 0.64, 0.91, 1.0], [0.0, 0.0, 1.0, 1.0, 0.0, 0.0])
    b = interp(x, [0.0, 0.11, 0.34, 0.65, 1.0], [0.5, 1.0, 1.0, 0.0, 0.0])
    return np.stack([r, g, b], axis=-1)


def apply_jet(gray_u8):
    """uint8 (H,W) -> BGR uint8 (H,W,3), matching cv2.applyColorMap(...,
    COLORMAP_JET) closely enough for overlays (used by create_heatmap_overlay,
    reference defect_projection.py:333)."""
    rgb = jet_colormap(gray_u8.astype(np.float64) / 255.0)
    bgr = (rgb[..., ::-1] * 255).astype(np.uint8)
    return bgr
