"""Settings loader — reads the reference's YAML schema verbatim.

Capability parity with the cv::FileStorage reads in the reference System ctor
(`/root/reference/src/System.cc:47-120,333-375`): the same keys
(`Camera.{fx,fy,cx,cy,k1,k2,p1,p2,k3,fps,RGB,bf}`, `ThDepth`,
`DepthMapFactor`, `ORBextractor.{nFeatures,scaleFactor,nLevels,iniThFAST,minThFAST}`,
`Viewer.*`, and EuRoC `LEFT./RIGHT.{K,D,R,P,height,width}`) parse from the
same settings files, so a reference user's YAML works unchanged.

OpenCV YAML files start with a `%YAML:1.0` directive and may contain
`!!opencv-matrix` tags; we normalize both so PyYAML can parse them.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, Optional

import numpy as np
import yaml


def _load_opencv_yaml(path: str) -> Dict[str, Any]:
    with open(path, "r") as f:
        text = f.read()
    # Strip the OpenCV YAML directive and map !!opencv-matrix to plain maps.
    text = re.sub(r"^%YAML[:\s][^\n]*\n", "", text)
    text = text.replace("!!opencv-matrix", "")
    return yaml.safe_load(text) or {}


def _as_matrix(node) -> np.ndarray:
    """Decode an opencv-matrix node {rows, cols, dt, data} -> ndarray."""
    if isinstance(node, dict) and "data" in node:
        rows = int(node.get("rows", 1))
        cols = int(node.get("cols", 1))
        return np.asarray(node["data"], np.float64).reshape(rows, cols)
    return np.asarray(node, np.float64)


@dataclasses.dataclass
class OrbParams:
    """ORB extractor parameters (`/root/reference/include/ORBextractor.h:38-47`)."""

    n_features: int = 2000
    scale_factor: float = 1.2
    n_levels: int = 8
    ini_th_fast: int = 20
    min_th_fast: int = 7


@dataclasses.dataclass
class CameraConfig:
    fx: float = 0.0
    fy: float = 0.0
    cx: float = 0.0
    cy: float = 0.0
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    fps: float = 30.0
    rgb: bool = True
    bf: float = 0.0
    width: int = 0
    height: int = 0


@dataclasses.dataclass
class RectificationConfig:
    """EuRoC-style stereo rectification block
    (`/root/reference/Examples/Stereo/stereo_euroc.cc:61-107`)."""

    K_l: np.ndarray = None
    K_r: np.ndarray = None
    D_l: np.ndarray = None
    D_r: np.ndarray = None
    R_l: np.ndarray = None
    R_r: np.ndarray = None
    P_l: np.ndarray = None
    P_r: np.ndarray = None
    width: int = 0
    height: int = 0


@dataclasses.dataclass
class Settings:
    camera: CameraConfig
    orb: OrbParams
    th_depth: float = 35.0
    depth_map_factor: float = 1.0
    viewer: Dict[str, float] = dataclasses.field(default_factory=dict)
    rectification: Optional[RectificationConfig] = None
    raw: Dict[str, Any] = dataclasses.field(default_factory=dict)

    @staticmethod
    def from_yaml(path: str) -> "Settings":
        d = _load_opencv_yaml(path)

        def g(key, default=None):
            return d.get(key, default)

        cam = CameraConfig(
            fx=float(g("Camera.fx", 0.0)),
            fy=float(g("Camera.fy", 0.0)),
            cx=float(g("Camera.cx", 0.0)),
            cy=float(g("Camera.cy", 0.0)),
            k1=float(g("Camera.k1", 0.0)),
            k2=float(g("Camera.k2", 0.0)),
            p1=float(g("Camera.p1", 0.0)),
            p2=float(g("Camera.p2", 0.0)),
            k3=float(g("Camera.k3", 0.0)),
            fps=float(g("Camera.fps", 30.0) or 30.0),
            rgb=bool(int(g("Camera.RGB", 1))),
            bf=float(g("Camera.bf", 0.0)),
            width=int(g("Camera.width", 0)),
            height=int(g("Camera.height", 0)),
        )
        orb = OrbParams(
            n_features=int(g("ORBextractor.nFeatures", 2000)),
            scale_factor=float(g("ORBextractor.scaleFactor", 1.2)),
            n_levels=int(g("ORBextractor.nLevels", 8)),
            ini_th_fast=int(g("ORBextractor.iniThFAST", 20)),
            min_th_fast=int(g("ORBextractor.minThFAST", 7)),
        )
        rect = None
        if "LEFT.K" in d:
            rect = RectificationConfig(
                K_l=_as_matrix(d["LEFT.K"]),
                K_r=_as_matrix(d["RIGHT.K"]),
                D_l=_as_matrix(d["LEFT.D"]),
                D_r=_as_matrix(d["RIGHT.D"]),
                R_l=_as_matrix(d["LEFT.R"]),
                R_r=_as_matrix(d["RIGHT.R"]),
                P_l=_as_matrix(d["LEFT.P"]),
                P_r=_as_matrix(d["RIGHT.P"]),
                width=int(d.get("LEFT.width", 0)),
                height=int(d.get("LEFT.height", 0)),
            )
        viewer = {k[len("Viewer."):]: v for k, v in d.items() if k.startswith("Viewer.")}
        dmf = float(g("DepthMapFactor", 1.0) or 1.0)
        return Settings(
            camera=cam,
            orb=orb,
            th_depth=float(g("ThDepth", 35.0) or 35.0),
            depth_map_factor=dmf,
            viewer=viewer,
            rectification=rect,
            raw=d,
        )
