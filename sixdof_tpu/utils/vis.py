"""Debug drawing helpers (3-D box, xyz axes, depth visualisation).

Mirrors reference Utils.py:456-479 (depth_to_vis), :675-749 (draw_xyz_axis,
draw_posed_3d_box), :293-300 (make_grid_image).  Uses OpenCV for 2-D drawing
only (host-side debug output, not the compute path).
"""
from __future__ import annotations

import numpy as np

from .colormap import apply_jet


def _cv2():
    import cv2

    return cv2


def depth_to_vis(depth, zmin=None, zmax=None, mode="rgb", inverse=True):
    depth = np.asarray(depth, dtype=np.float64)
    if zmin is None:
        zmin = depth.min()
    if zmax is None:
        zmax = depth.max()
    if inverse:
        invalid = depth < 0.001
        vis = zmin / (depth + 1e-8)
        vis[invalid] = 0
    else:
        depth = depth.clip(zmin, zmax)
        invalid = (depth == zmin) | (depth == zmax)
        denom = max(zmax - zmin, 1e-12)
        vis = (depth - zmin) / denom
        vis[invalid] = 1
    if mode == "gray":
        return (vis * 255).clip(0, 255).astype(np.uint8)
    if mode == "rgb":
        return apply_jet((vis * 255).clip(0, 255).astype(np.uint8))[..., ::-1]
    raise RuntimeError(mode)


def project_3d_to_2d(pt, K, ob_in_cam):
    pt = np.asarray(pt, dtype=np.float64).reshape(4, 1)
    projected = K @ (ob_in_cam @ pt)[:3, :]
    projected = projected.reshape(-1)
    projected = projected / projected[2]
    return projected[:2].round().astype(int)


def draw_xyz_axis(color, ob_in_cam, scale=0.1, K=np.eye(3), thickness=3, transparency=0, is_input_rgb=False):
    cv2 = _cv2()
    if is_input_rgb:
        color = cv2.cvtColor(color, cv2.COLOR_RGB2BGR)
    xx = np.array([1, 0, 0, 1.0]); xx[:3] *= scale
    yy = np.array([0, 1, 0, 1.0]); yy[:3] *= scale
    zz = np.array([0, 0, 1, 1.0]); zz[:3] *= scale
    origin = tuple(project_3d_to_2d(np.array([0, 0, 0, 1.0]), K, ob_in_cam))
    tmp = color.copy()
    for end, col in [(xx, (0, 0, 255)), (yy, (0, 255, 0)), (zz, (255, 0, 0))]:
        pt = tuple(project_3d_to_2d(end, K, ob_in_cam))
        tmp1 = cv2.arrowedLine(tmp.copy(), origin, pt, color=col, thickness=thickness,
                               line_type=cv2.LINE_AA, tipLength=0)
        mask = np.linalg.norm(tmp1.astype(float) - tmp.astype(float), axis=-1) > 0
        tmp[mask] = (tmp[mask] * transparency + tmp1[mask] * (1 - transparency)).astype(tmp.dtype)
    if is_input_rgb:
        tmp = cv2.cvtColor(tmp, cv2.COLOR_BGR2RGB)
    return tmp


def draw_posed_3d_box(K, img, ob_in_cam, bbox, line_color=(0, 255, 0), linewidth=2):
    cv2 = _cv2()
    min_xyz = bbox.min(axis=0)
    max_xyz = bbox.max(axis=0)
    xmin, ymin, zmin = min_xyz
    xmax, ymax, zmax = max_xyz

    def draw_line3d(start, end, img):
        pts = np.stack([start, end], axis=0)
        pts = (ob_in_cam[:3, :3] @ pts.T).T + ob_in_cam[:3, 3]
        projected = (K @ pts.T).T
        uv = np.round(projected[:, :2] / projected[:, 2:3]).astype(int)
        return cv2.line(img, uv[0].tolist(), uv[1].tolist(), color=line_color,
                        thickness=linewidth, lineType=cv2.LINE_AA)

    for y in [ymin, ymax]:
        for z in [zmin, zmax]:
            img = draw_line3d(np.array([xmin, y, z]), np.array([xmax, y, z]), img)
    for x in [xmin, xmax]:
        for z in [zmin, zmax]:
            img = draw_line3d(np.array([x, ymin, z]), np.array([x, ymax, z]), img)
    for x in [xmin, xmax]:
        for y in [ymin, ymax]:
            img = draw_line3d(np.array([x, y, zmin]), np.array([x, y, zmax]), img)
    return img


def make_grid_image(imgs, nrow, padding=5, pad_value=255):
    """(B,H,W,C) list/array -> tiled grid image (numpy reimplementation of
    torchvision.utils.make_grid as used in reference Utils.py:293-300)."""
    imgs = [np.asarray(im) for im in imgs]
    H = max(im.shape[0] for im in imgs)
    W = max(im.shape[1] for im in imgs)
    n = len(imgs)
    ncol = nrow
    nrow_out = (n + ncol - 1) // ncol
    out = np.full(
        (padding + nrow_out * (H + padding), padding + ncol * (W + padding), 3),
        pad_value, dtype=np.uint8,
    )
    for i, im in enumerate(imgs):
        if im.ndim == 2:
            im = np.repeat(im[..., None], 3, axis=-1)
        r, c = divmod(i, ncol)
        y = padding + r * (H + padding)
        x = padding + c * (W + padding)
        out[y : y + im.shape[0], x : x + im.shape[1]] = im.astype(np.uint8)
    return out


def cv_draw_text(img, text, uv_top_left, color=(255, 255, 255), fontScale=0.5, thickness=1):
    cv2 = _cv2()
    x, y = int(uv_top_left[0]), int(uv_top_left[1])
    for line in str(text).splitlines():
        (w, h), _ = cv2.getTextSize(line, cv2.FONT_HERSHEY_SIMPLEX, fontScale, thickness)
        y += h
        cv2.putText(img, line, (x, y), cv2.FONT_HERSHEY_SIMPLEX, fontScale, color,
                    thickness, cv2.LINE_AA)
        y += int(h * 0.5)
    return img
