"""OpenCV-FileStorage-compatible YAML reading/writing.

The reference stores every piece of configuration in OpenCV FileStorage YAML
(`/root/reference/linemod_settings.yml`, `models/*.yml`, `benchmark/pose*.yml`;
read at src/utility.cpp:139-173, src/CameraViewPoints.cpp:56-67,
src/Benchmark.cpp:182-194). OpenCV's dialect is YAML 1.0 with a `%YAML:1.0`
directive and `!!opencv-matrix` tags, both of which stock PyYAML rejects, so we
sanitize before parsing and resolve matrix nodes to numpy arrays.
"""

from __future__ import annotations

import re

import numpy as np
import yaml


def _sanitize(text: str) -> str:
    # `%YAML:1.0` is an invalid directive for PyYAML; drop it.
    lines = []
    for line in text.splitlines():
        if line.startswith("%YAML"):
            continue
        # OpenCV writes `!!opencv-matrix`; map to a vanilla mapping.
        line = line.replace("!!opencv-matrix", "")
        lines.append(line)
    return "\n".join(lines)


def _resolve(node):
    if isinstance(node, dict):
        if {"rows", "cols", "dt", "data"} <= set(node.keys()):
            arr = np.array(node["data"], dtype=np.float64)
            return arr.reshape(int(node["rows"]), int(node["cols"]))
        return {k: _resolve(v) for k, v in node.items()}
    if isinstance(node, list):
        return [_resolve(v) for v in node]
    return node


def read_yamlcv(path: str) -> dict:
    """Read an OpenCV FileStorage YAML file into a dict.

    `!!opencv-matrix` nodes become numpy arrays of shape (rows, cols).
    """
    with open(path, "r") as f:
        raw = f.read()
    data = yaml.safe_load(_sanitize(raw))
    if data is None:
        return {}
    return _resolve(data)


def _fmt_scalar(v) -> str:
    if isinstance(v, (bool, np.bool_)):
        return "1" if v else "0"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    return f'"{v}"'


def write_yamlcv(path: str, data: dict) -> None:
    """Write a dict to OpenCV-FileStorage-compatible YAML.

    numpy 2-D arrays are emitted as `!!opencv-matrix` nodes so the files can be
    read back by OpenCV's FileStorage (and by :func:`read_yamlcv`).
    """
    out = ["%YAML:1.0", "---"]
    for key, val in data.items():
        if isinstance(val, np.ndarray) and val.ndim == 2:
            out.append(f"{key}: !!opencv-matrix")
            out.append(f"   rows: {val.shape[0]}")
            out.append(f"   cols: {val.shape[1]}")
            out.append("   dt: d")
            flat = ", ".join(repr(float(x)) for x in val.ravel())
            out.append(f"   data: [ {flat} ]")
        elif isinstance(val, (list, tuple, np.ndarray)):
            flat = ", ".join(_fmt_scalar(x) for x in np.asarray(val).ravel())
            out.append(f"{key}: [ {flat} ]")
        else:
            out.append(f"{key}: {_fmt_scalar(val)}")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")


_KEY_RE = re.compile(r"^[A-Za-z_][\w ]*$")
