"""Minimal PLY reader/writer (ascii + binary_little_endian).

Replaces the reference's open3d dependency for loading `sparse_pc.ply`
(/root/reference/gaussctrl/gc_dataparser_ns.py:436-473). Host-side IO, numpy
only — supports the vertex x/y/z + red/green/blue layout the bundled scenes
use, plus arbitrary float/uchar vertex properties for splat checkpoints.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

_DTYPES = {
    "float": "<f4", "float32": "<f4", "double": "<f8", "float64": "<f8",
    "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
    "short": "<i2", "ushort": "<u2", "int": "<i4", "int32": "<i4",
    "uint": "<u4", "uint32": "<u4",
}


def read_ply(path) -> dict[str, np.ndarray]:
    """Read vertex properties from a PLY file → {name: [N] array}."""
    path = Path(path)
    with open(path, "rb") as f:
        magic = f.readline().strip()
        if magic != b"ply":
            raise ValueError(f"{path} is not a PLY file")
        fmt = None
        n_vertex = None
        props: list[tuple[str, str]] = []
        in_vertex = False
        while True:
            line = f.readline()
            if not line:
                raise ValueError("unexpected EOF in PLY header")
            tokens = line.decode("ascii", "replace").strip().split()
            if not tokens:
                continue
            if tokens[0] == "format":
                fmt = tokens[1]
            elif tokens[0] == "element":
                in_vertex = tokens[1] == "vertex"
                if in_vertex:
                    n_vertex = int(tokens[2])
            elif tokens[0] == "property" and in_vertex:
                if tokens[1] == "list":
                    raise ValueError("list properties unsupported for vertices")
                props.append((tokens[2], _DTYPES[tokens[1]]))
            elif tokens[0] == "end_header":
                break
        assert n_vertex is not None and fmt is not None
        if fmt == "ascii":
            body = np.loadtxt(f, max_rows=n_vertex)
            body = body.reshape(n_vertex, len(props))
            return {
                name: body[:, i].astype(np.dtype(dt).base)
                for i, (name, dt) in enumerate(props)
            }
        if fmt in ("binary_little_endian", "binary_big_endian"):
            order = "<" if fmt == "binary_little_endian" else ">"
            rec = np.dtype([(name, dt.replace("<", order)) for name, dt in props])
            raw = np.frombuffer(f.read(rec.itemsize * n_vertex), dtype=rec)
            return {name: np.ascontiguousarray(raw[name]) for name, _ in props}
        raise ValueError(f"unsupported PLY format {fmt}")


def read_point_cloud(path) -> tuple[np.ndarray, np.ndarray]:
    """→ (points [N,3] f32, colors [N,3] f32 in [0,1])."""
    v = read_ply(path)
    pts = np.stack([v["x"], v["y"], v["z"]], -1).astype(np.float32)
    if "red" in v:
        cols = np.stack([v["red"], v["green"], v["blue"]], -1).astype(np.float32)
        if cols.max() > 1.0:
            cols = cols / 255.0
    else:
        cols = np.full_like(pts, 0.5)
    return pts, cols


def write_ply(path, points: np.ndarray, colors: np.ndarray | None = None):
    """Write a binary point cloud (for exporting edited scenes)."""
    n = points.shape[0]
    props = [("x", "<f4"), ("y", "<f4"), ("z", "<f4")]
    if colors is not None:
        props += [("red", "u1"), ("green", "u1"), ("blue", "u1")]
    rec = np.zeros(n, dtype=np.dtype(props))
    rec["x"], rec["y"], rec["z"] = points[:, 0], points[:, 1], points[:, 2]
    if colors is not None:
        c = np.clip(colors * 255.0, 0, 255).astype(np.uint8) if colors.max() <= 1.0 else colors.astype(np.uint8)
        rec["red"], rec["green"], rec["blue"] = c[:, 0], c[:, 1], c[:, 2]
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {n}\n".encode())
        typemap = {"<f4": "float", "u1": "uchar"}
        for name, dt in props:
            f.write(f"property {typemap[dt]} {name}\n".encode())
        f.write(b"end_header\n")
        f.write(rec.tobytes())
