"""Settings-file compatibility: the reference's OpenCV-YAML config schema.

Parses the same keys the reference reads in Tracking's constructor
(src/Tracking.cc:104-230: Camera.{fx,fy,cx,cy,k1,k2,p1,p2,k3,fps},
Camera2.{nRows,nCols}, ORBextractor.{nFeatures,scaleFactor,nLevels,fastTh},
UseMotionModel) so existing EuRoC/TUM/NUIM yaml files drive this system
unchanged. The reference's ~60 compile-time #defines (Tracking.h:71-132)
become runtime fields of SlamConfig with the shipped configuration as
defaults.
"""

from __future__ import annotations

import re

from gf_orb_slam_tpu.geometry.camera import CameraModel
from gf_orb_slam_tpu.pipeline.system import SlamConfig


def _parse_opencv_yaml(path: str) -> dict:
    """Minimal parser for OpenCV-style YAML (%YAML:1.0 header, key: value).

    Not a general YAML parser — handles the flat numeric schema these settings
    files use, which PyYAML chokes on because of the %YAML:1.0 directive.
    """
    values: dict[str, float] = {}
    with open(path) as f:
        for line in f:
            line = line.split("#")[0].strip()
            m = re.match(r"^([A-Za-z0-9_.]+)\s*:\s*(-?[0-9.eE+-]+)\s*$", line)
            if m:
                values[m.group(1)] = float(m.group(2))
    return values


def load_settings(path: str) -> tuple[CameraModel, SlamConfig]:
    v = _parse_opencv_yaml(path)

    cam = CameraModel(
        fx=v.get("Camera.fx", 458.654),
        fy=v.get("Camera.fy", 457.296),
        cx=v.get("Camera.cx", 367.215),
        cy=v.get("Camera.cy", 248.375),
        k1=v.get("Camera.k1", 0.0),
        k2=v.get("Camera.k2", 0.0),
        p1=v.get("Camera.p1", 0.0),
        p2=v.get("Camera.p2", 0.0),
        k3=v.get("Camera.k3", 0.0),
        width=int(v.get("Camera2.nCols", 752)),
        height=int(v.get("Camera2.nRows", 480)),
        fps=v.get("Camera.fps", 20.0),
    )
    fps = cam.fps if cam.fps > 0 else 30.0
    cfg = SlamConfig(
        n_features=int(v.get("ORBextractor.nFeatures", 800)),
        n_levels=int(v.get("ORBextractor.nLevels", 8)),
        scale=v.get("ORBextractor.scaleFactor", 1.2),
        fast_threshold=v.get("ORBextractor.fastTh", 20.0),
        use_motion_model=bool(int(v.get("UseMotionModel", 1))),
        # ref mMaxFrames = 18 * fps / 30 (src/Tracking.cc:153)
        max_frames_between_kf=max(int(18 * fps / 30), 4),
    )
    return cam, cfg
