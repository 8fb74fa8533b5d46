"""PLY I/O without external deps: colored point clouds + 3DGS Gaussian plys.

Two formats, both binary-little-endian, matching the reference byte-for-byte
so plys interoperate with the reference and standard 3DGS viewers:

- point-cloud ply (scene/dataset_readers.py:213-237 fetchPly/storePly):
  vertex = (x y z f4, nx ny nz f4, red green blue u1);
- Gaussian-model ply (scene/gaussian_model.py:246-278 save_ply /
  285-326 load_ply): vertex = (x y z, nx ny nz, f_dc_0..2,
  f_rest_0..{3K-4}, opacity, scale_0..2, rot_0..3) all f4, where the SH
  rest coefficients are stored CHANNEL-major (the torch code transposes
  [N, K-1, 3] -> [N, 3, K-1] before flattening — save_ply:266).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from instantsplat_tpu.models.gaussians import GaussianModel


def _write_ply(path, named_arrays):
    """Write one binary_little_endian 'vertex' element.

    named_arrays: list of (name, 1-D np array); u1 arrays stay uchar,
    everything else is written f4.
    """
    n = len(named_arrays[0][1])
    dtype = []
    for name, arr in named_arrays:
        kind = "u1" if arr.dtype == np.uint8 else "f4"
        dtype.append((name, kind))
    rec = np.empty(n, dtype=dtype)
    for name, arr in named_arrays:
        rec[name] = arr
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n}"]
    for name, arr in named_arrays:
        t = "uchar" if arr.dtype == np.uint8 else "float"
        header.append(f"property {t} {name}")
    header.append("end_header\n")
    with open(path, "wb") as f:
        f.write("\n".join(header).encode("ascii"))
        rec.tofile(f)


def _read_ply(path):
    """-> dict name -> np array (binary LE or ascii, single vertex element)."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"not a ply file: {path}")
        fmt = f.readline().split()[1]
        props, n = [], 0
        _types = {
            b"float": np.float32, b"float32": np.float32,
            b"double": np.float64, b"float64": np.float64,
            b"uchar": np.uint8, b"uint8": np.uint8,
            b"char": np.int8, b"short": np.int16, b"ushort": np.uint16,
            b"int": np.int32, b"int32": np.int32, b"uint": np.uint32,
        }
        while True:
            line = f.readline().strip()
            if line == b"end_header":
                break
            parts = line.split()
            if parts[0] == b"element":
                if parts[1] != b"vertex" and n:
                    raise ValueError("only single-vertex-element plys")
                n = int(parts[2])
            elif parts[0] == b"property":
                if parts[1] == b"list":
                    raise ValueError("list properties unsupported")
                props.append((parts[2].decode(), _types[parts[1]]))
        if fmt == b"ascii":
            data = np.loadtxt(f, dtype=np.float64, max_rows=n).reshape(n, -1)
            return {
                name: data[:, i].astype(t)
                for i, (name, t) in enumerate(props)
            }
        dtype = np.dtype([(name, t) for name, t in props])
        rec = np.fromfile(f, dtype=dtype, count=n)
    return {name: rec[name] for name, _ in props}


# ---------------------------------------------------------------------------
# colored point clouds (init_geo artifact)
# ---------------------------------------------------------------------------


def store_point_cloud(path, xyz, rgb):
    """rgb in [0, 255]; normals written as zeros (reference storePly)."""
    xyz = np.asarray(xyz, np.float32)
    rgb = np.clip(np.asarray(rgb), 0, 255).astype(np.uint8)
    zeros = np.zeros(len(xyz), np.float32)
    _write_ply(path, [
        ("x", xyz[:, 0]), ("y", xyz[:, 1]), ("z", xyz[:, 2]),
        ("nx", zeros), ("ny", zeros), ("nz", zeros),
        ("red", rgb[:, 0]), ("green", rgb[:, 1]), ("blue", rgb[:, 2]),
    ])


def fetch_point_cloud(path):
    """-> (xyz [N,3] f32, colors [N,3] in [0,1])."""
    d = _read_ply(path)
    xyz = np.stack([d["x"], d["y"], d["z"]], -1).astype(np.float32)
    rgb = np.stack([d["red"], d["green"], d["blue"]], -1).astype(np.float32)
    return xyz, rgb / 255.0


# ---------------------------------------------------------------------------
# Gaussian model plys (training snapshots; 3DGS-viewer compatible)
# ---------------------------------------------------------------------------


def save_gaussian_ply(path, params: GaussianModel):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    xyz = np.asarray(params.xyz, np.float32)
    n = len(xyz)
    zeros = np.zeros(n, np.float32)
    cols = [("x", xyz[:, 0]), ("y", xyz[:, 1]), ("z", xyz[:, 2]),
            ("nx", zeros), ("ny", zeros), ("nz", zeros)]
    # channel-major flattening (reference save_ply transposes before flatten)
    f_dc = np.asarray(params.features_dc, np.float32).transpose(0, 2, 1)
    f_dc = f_dc.reshape(n, -1)
    for i in range(f_dc.shape[1]):
        cols.append((f"f_dc_{i}", f_dc[:, i]))
    f_rest = np.asarray(params.features_rest, np.float32).transpose(0, 2, 1)
    f_rest = f_rest.reshape(n, -1)
    for i in range(f_rest.shape[1]):
        cols.append((f"f_rest_{i}", f_rest[:, i]))
    cols.append(("opacity", np.asarray(params.opacity, np.float32)[:, 0]))
    scaling = np.asarray(params.scaling, np.float32)
    for i in range(scaling.shape[1]):
        cols.append((f"scale_{i}", scaling[:, i]))
    rotation = np.asarray(params.rotation, np.float32)
    for i in range(rotation.shape[1]):
        cols.append((f"rot_{i}", rotation[:, i]))
    _write_ply(path, cols)


def load_gaussian_ply(path, max_sh_degree=3, cam_poses=None) -> GaussianModel:
    import jax.numpy as jnp

    d = _read_ply(path)
    n = len(d["x"])
    xyz = np.stack([d["x"], d["y"], d["z"]], -1).astype(np.float32)
    opacity = np.asarray(d["opacity"], np.float32)[:, None]
    f_dc = np.stack([d[f"f_dc_{i}"] for i in range(3)], -1)[:, None, :]
    k = (max_sh_degree + 1) ** 2
    n_rest = 3 * (k - 1)
    rest_names = sorted(
        (name for name in d if name.startswith("f_rest_")),
        key=lambda s: int(s.split("_")[-1]),
    )
    assert len(rest_names) == n_rest, (len(rest_names), n_rest)
    # stored channel-major [N, 3, K-1] -> ours [N, K-1, 3]
    f_rest = np.stack([d[name] for name in rest_names], -1)
    f_rest = f_rest.reshape(n, 3, k - 1).transpose(0, 2, 1)
    scaling = np.stack(
        [d[f"scale_{i}"] for i in range(3)], -1).astype(np.float32)
    rotation = np.stack(
        [d[f"rot_{i}"] for i in range(4)], -1).astype(np.float32)
    if cam_poses is None:
        cam_poses = np.zeros((0, 7), np.float32)
    return GaussianModel(
        xyz=jnp.asarray(xyz),
        features_dc=jnp.asarray(f_dc, jnp.float32),
        features_rest=jnp.asarray(f_rest, jnp.float32),
        scaling=jnp.asarray(scaling),
        rotation=jnp.asarray(rotation),
        opacity=jnp.asarray(opacity),
        cam_poses=jnp.asarray(cam_poses, jnp.float32),
        max_sh_degree=max_sh_degree,
    )
