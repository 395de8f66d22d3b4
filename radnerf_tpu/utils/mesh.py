"""Mesh extraction from the density field (save_mesh capability).

Reference: nerf/utils.py:871-891 (Trainer.save_mesh) queries sigma on a
dense grid over the inference AABB and runs marching cubes (the mcubes
package) at a density threshold, exporting via trimesh.

Self-contained TPU-friendly re-implementation: the iso-surface is extracted
with MARCHING TETRAHEDRA (each cell split into 6 tetrahedra; per-tet
triangulation has only 16 trivially-enumerable cases, so no 256-entry
lookup tables are needed) fully vectorized in numpy, and the mesh is written
as a binary-free ASCII PLY (no trimesh dependency).
"""

from __future__ import annotations

import numpy as np

# the 6 tetrahedra of a cube, as corner indices (corner k = (x,y,z) bits)
_TETS = np.array(
    [
        [0, 5, 1, 6],
        [0, 1, 2, 6],
        [0, 2, 3, 6],
        [0, 3, 7, 6],
        [0, 7, 4, 6],
        [0, 4, 5, 6],
    ],
    np.int32,
)
_CORNER_OFFSETS = np.array(
    [[(k >> 0) & 1, (k >> 1) & 1, (k >> 2) & 1] for k in range(8)], np.int32
)

# per-tet case table: for each of 16 sign patterns, the (up to 2) triangles,
# each vertex an edge of the tet (pair of local tet-corner ids)
_EDGES = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def _tet_triangles(case: int):
    inside = [i for i in range(4) if case & (1 << i)]
    outside = [i for i in range(4) if not case & (1 << i)]
    if len(inside) == 0 or len(inside) == 4:
        return []
    if len(inside) == 1:
        a = inside[0]
        e = [(a, b) for b in outside]
        return [(e[0], e[1], e[2])]
    if len(inside) == 3:
        a = outside[0]
        e = [(b, a) for b in inside]
        return [(e[0], e[2], e[1])]
    # two in, two out -> quad = 2 triangles
    a, b = inside
    c, d = outside
    return [((a, c), (b, c), (b, d)), ((a, c), (b, d), (a, d))]


def marching_tetrahedra(field: np.ndarray, threshold: float):
    """Extract an iso-surface from a dense scalar field [X, Y, Z].

    Returns (vertices [V, 3] in grid coords, triangles [F, 3] int).
    """
    X, Y, Z = field.shape
    gx, gy, gz = np.mgrid[0: X - 1, 0: Y - 1, 0: Z - 1]
    base = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1)  # [C, 3]

    corner_vals = np.stack(
        [
            field[
                base[:, 0] + o[0], base[:, 1] + o[1], base[:, 2] + o[2]
            ]
            for o in _CORNER_OFFSETS
        ],
        -1,
    )  # [C, 8]

    verts = []
    faces = []
    v_count = 0
    for tet in _TETS:
        tv = corner_vals[:, tet]  # [C, 4]
        inside = tv > threshold
        case = (
            inside[:, 0].astype(np.int32)
            + 2 * inside[:, 1]
            + 4 * inside[:, 2]
            + 8 * inside[:, 3]
        )
        for c in range(1, 15):
            sel = np.nonzero(case == c)[0]
            if len(sel) == 0:
                continue
            for tri in _tet_triangles(c):
                tri_verts = []
                for (ia, ib) in tri:
                    va = tv[sel, ia]
                    vb = tv[sel, ib]
                    t = np.clip((threshold - va) / (vb - va + 1e-12), 0.0, 1.0)
                    pa = (base[sel] + _CORNER_OFFSETS[tet[ia]]).astype(np.float64)
                    pb = (base[sel] + _CORNER_OFFSETS[tet[ib]]).astype(np.float64)
                    tri_verts.append(pa + t[:, None] * (pb - pa))
                n = len(sel)
                verts.extend(tri_verts)
                faces.append(
                    np.stack(
                        [
                            np.arange(v_count, v_count + n),
                            np.arange(v_count + n, v_count + 2 * n),
                            np.arange(v_count + 2 * n, v_count + 3 * n),
                        ],
                        -1,
                    )
                )
                v_count += 3 * n

    if not verts:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
    vertices = np.concatenate(verts, 0)
    triangles = np.concatenate(faces, 0)
    return vertices, triangles


# keep the conventional name as an alias
marching_cubes = marching_tetrahedra


def extract_geometry(bound_min, bound_max, resolution, threshold, query_func,
                     chunk: int = 128**2 * 16):
    """Dense sigma sweep + iso-surface extraction (utils.py:849-869
    extract_geometry equivalent). query_func: [N, 3] -> [N] sigma."""
    bound_min = np.asarray(bound_min, np.float32)
    bound_max = np.asarray(bound_max, np.float32)
    axes = [np.linspace(bound_min[i], bound_max[i], resolution) for i in range(3)]
    gx, gy, gz = np.meshgrid(*axes, indexing="ij")
    pts = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1).astype(np.float32)

    vals = np.empty(pts.shape[0], np.float32)
    for head in range(0, pts.shape[0], chunk):
        vals[head: head + chunk] = np.asarray(query_func(pts[head: head + chunk]))
    field = vals.reshape(resolution, resolution, resolution)

    vertices, triangles = marching_tetrahedra(field, threshold)
    # grid coords -> world
    scale = (bound_max - bound_min) / (resolution - 1)
    vertices = vertices * scale + bound_min
    return vertices.astype(np.float32), triangles


def save_mesh_ply(path: str, vertices: np.ndarray, triangles: np.ndarray):
    """Write an ASCII PLY mesh."""
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(vertices)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(triangles)}\n")
        f.write("property list uchar int vertex_indices\n")
        f.write("end_header\n")
        for v in vertices:
            f.write(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for t in triangles:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")
