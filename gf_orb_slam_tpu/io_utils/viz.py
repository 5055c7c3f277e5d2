"""Visualization export — the FramePublisher / MapPublisher equivalents.

The reference publishes an annotated camera frame on /ORB_SLAM/Frame (tracked
keypoints in one color, GF-selected in another; include/FramePublisher.h:62-69)
and rviz markers for points/keyframe frusta/covisibility on /ORB_SLAM/Map
(include/MapPublisher.h:55-62). Without ROS, the equivalents are:

* annotate_frame(...)   → RGB numpy image with tracked/selected keypoints drawn
* export_map_ply(...)   → PLY point cloud + keyframe frusta + covisibility
                          edges, loadable in MeshLab/CloudCompare/rerun
"""

from __future__ import annotations

import numpy as np

from gf_orb_slam_tpu.mapping import map_state as ms


def annotate_frame(
    img: np.ndarray,
    kp_uv: np.ndarray,
    tracked: np.ndarray,
    gf_selected: np.ndarray | None = None,
    radius: int = 3,
) -> np.ndarray:
    """Grayscale (H, W) + keypoints → RGB uint8 with color-coded markers:
    green = tracked, magenta = GF-selected, gray = detected only."""
    h, w = img.shape
    rgb = np.stack([img, img, img], axis=-1).astype(np.uint8)

    def draw(u, v, color):
        x, y = int(round(u)), int(round(v))
        if not (radius <= x < w - radius and radius <= y < h - radius):
            return
        rgb[y - radius : y + radius + 1, x - radius : x + radius + 1] = color
        rgb[y - radius + 1 : y + radius, x - radius + 1 : x + radius] = (
            img[y - radius + 1 : y + radius, x - radius + 1 : x + radius, None]
        )

    for i, (u, v) in enumerate(kp_uv):
        if gf_selected is not None and i < len(gf_selected) and gf_selected[i]:
            draw(u, v, (255, 0, 255))
        elif tracked[i]:
            draw(u, v, (0, 255, 0))
    return rgb


def export_map_ply(path: str, m: ms.MapState, with_covisibility: bool = True):
    """Write the map as an ASCII PLY: map points (white), camera centers
    (red), covisibility edges."""
    from gf_orb_slam_tpu.geometry import se3
    import jax.numpy as jnp

    pts = np.asarray(m.pt_pos)[np.asarray(m.pt_valid)]
    kf_valid = np.asarray(m.kf_valid)
    centers = np.asarray(se3.pose_t(se3.inverse(m.kf_pose)))[kf_valid]

    edges = []
    if with_covisibility:
        W = np.asarray(ms.covisibility(m))
        ids = np.nonzero(kf_valid)[0]
        remap = {k: i for i, k in enumerate(ids)}
        for a in ids:
            for b in ids:
                if b > a and W[a, b] >= 15:
                    edges.append((remap[a], remap[b]))

    n_v = len(pts) + len(centers)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n_v}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write(f"element edge {len(edges)}\n")
        f.write("property int vertex1\nproperty int vertex2\n")
        f.write("end_header\n")
        for p in pts:
            f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} 200 200 200\n")
        for c in centers:
            f.write(f"{c[0]:.4f} {c[1]:.4f} {c[2]:.4f} 255 40 40\n")
        off = len(pts)
        for a, b in edges:
            f.write(f"{off + a} {off + b}\n")
