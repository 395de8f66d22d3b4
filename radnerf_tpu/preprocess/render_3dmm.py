"""Differentiable 3DMM mesh renderer in JAX (photometric tracking stage).

Reference: data_utils/face_tracking/render_3dmm.py — pytorch3d MeshRenderer
with a per-vertex-color soft shader and a 9-band SH "Illumination_layer"
(render_3dmm.py:151-193), driven by face_tracker.py:178-248 for texture/
lighting and fine pose fitting.

TPU-native re-design (no pytorch3d): **deferred-visibility rasterization**.
The per-pixel triangle assignment is computed under ``stop_gradient`` with a
tile-binned, z-buffered, static-shape pass (pure gathers/argmin — XLA
friendly), then barycentrics are *re-derived differentiably* from the
projected vertex positions and used to interpolate vertex attributes. This
is the nvdiffrast deferred-shading formulation: gradients flow to geometry,
texture and lighting through the interior shading term; visibility-edge
gradients (which pytorch3d approximates with sigma-blur) are dropped —
the photometric refinement is driven by interior color error, matching how
the reference uses its renderer (mask > 0 photometric loss).

All shapes are static: triangles are binned to fixed-size per-tile candidate
lists (capacity ``K``) via one sort + searchsorted, and every tile of pixels
tests its K candidates as one [P, K] batched barycentric evaluation.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------------ geometry
@dataclasses.dataclass
class MeshBasis:
    """Full-vertex 3DMM: verts = mean + id_base@id + exp_base@exp; per-vertex
    albedo tex = tex_mean + tex_base@tex (0..255 range, like the BFM).

    mean [V,3]; id_base [V,3,id]; exp_base [V,3,exp];
    tex_mean [V,3]; tex_base [V,3,tex]; tris [T,3] int32;
    rigid_ids: vertex indices used for the temporal laplacian (optional).
    """

    mean: np.ndarray
    id_base: np.ndarray
    exp_base: np.ndarray
    tex_mean: np.ndarray
    tex_base: np.ndarray
    tris: np.ndarray
    rigid_ids: Optional[np.ndarray] = None

    @property
    def id_dim(self):
        return self.id_base.shape[-1]

    @property
    def exp_dim(self):
        return self.exp_base.shape[-1]

    @property
    def tex_dim(self):
        return self.tex_base.shape[-1]


def mesh_basis_from_file(info_path: str, topology_path: str,
                         keys_path: Optional[str] = None,
                         id_dim: int = 100, exp_dim: int = 79,
                         tex_dim: int = 100) -> MeshBasis:
    """Load a MeshBasis from the reference's ``3DMM_info.npy`` +
    ``topology_info.npy`` (tris) [+ ``keys_info.npy`` for rigid_ids]
    (convert_BFM.py / facemodel.py:15-47 formats; sigma folded into bases
    so unit-scale parameters match the reference's ``para * sig``)."""
    info = np.load(info_path, allow_pickle=True).item()
    topo = np.load(topology_path, allow_pickle=True).item()

    mu = (np.asarray(info["mu_shape"]) + np.asarray(info["mu_exp"])).reshape(-1, 3)
    mu = mu - mu.mean(axis=0, keepdims=True)
    mu = (mu / 100000.0).astype(np.float32)
    V = mu.shape[0]

    def _base(b, sig, dim, scale):
        b = np.asarray(b)[:dim].reshape(dim, V, 3) / scale
        b = b * np.asarray(sig)[:dim, None, None]
        return np.transpose(b, (1, 2, 0)).astype(np.float32)

    rigid = None
    if keys_path is not None:
        keys = np.load(keys_path, allow_pickle=True).item()
        rigid = np.asarray(keys.get("rigid_ids"))
    return MeshBasis(
        mean=mu,
        id_base=_base(info["b_shape"], info["sig_shape"], id_dim, 1e5),
        exp_base=_base(info["b_exp"], info["sig_exp"], exp_dim, 1e5),
        tex_mean=np.asarray(info["mu_tex"], np.float32).reshape(V, 3),
        tex_base=_base(info["b_tex"], info["sig_tex"], tex_dim, 1.0),
        tris=np.asarray(topo["tris"], np.int32),
        rigid_ids=rigid,
    )


def forward_geo(basis: MeshBasis, ids: jnp.ndarray, exp: jnp.ndarray):
    """[B, id_dim], [B, exp_dim] -> camera-free vertices [B, V, 3]."""
    return (
        jnp.asarray(basis.mean)[None]
        + jnp.einsum("vdi,bi->bvd", jnp.asarray(basis.id_base), ids)
        + jnp.einsum("vdi,bi->bvd", jnp.asarray(basis.exp_base), exp)
    )


def forward_tex(basis: MeshBasis, tex: jnp.ndarray):
    """[B, tex_dim] -> per-vertex albedo [B, V, 3] (0..255 range)."""
    return jnp.asarray(basis.tex_mean)[None] + jnp.einsum(
        "vdi,bi->bvd", jnp.asarray(basis.tex_base), tex
    )


def vertex_normals(verts: jnp.ndarray, tris: jnp.ndarray) -> jnp.ndarray:
    """Area-weighted vertex normals [B, V, 3] (render_3dmm.py:103-111,
    expressed as a segment-sum scatter instead of a vert_tris gather)."""
    p0 = verts[:, tris[:, 0]]
    p1 = verts[:, tris[:, 1]]
    p2 = verts[:, tris[:, 2]]
    tn = jnp.cross(p1 - p0, p2 - p0)  # area-weighted
    tn = tn / (jnp.linalg.norm(tn, axis=-1, keepdims=True) + 1e-12)
    V = verts.shape[1]
    flat = jnp.concatenate([tris[:, 0], tris[:, 1], tris[:, 2]], 0)

    def one(tn_b):
        contrib = jnp.concatenate([tn_b, tn_b, tn_b], 0)
        vn = jax.ops.segment_sum(contrib, flat, num_segments=V)
        return vn / (jnp.linalg.norm(vn, axis=-1, keepdims=True) + 1e-12)

    return jax.vmap(one)(tn)


# ------------------------------------------------------------------ lighting
_A = (np.pi, 2 * np.pi / np.sqrt(3.0), 2 * np.pi / np.sqrt(8.0))
_C = (1 / np.sqrt(4 * np.pi), np.sqrt(3.0) / np.sqrt(4 * np.pi),
      3 * np.sqrt(5.0) / np.sqrt(12 * np.pi))
_D0 = 0.5 / np.sqrt(3.0)


def sh_irradiance(normals: jnp.ndarray, gamma: jnp.ndarray) -> jnp.ndarray:
    """9-band SH lighting (render_3dmm.py:151-189): normals [B, V, 3],
    gamma [B, 27] (3 channels x 9 coeffs, +0.8 ambient on band 0) ->
    per-vertex RGB lighting [B, V, 3]."""
    g = gamma.reshape(-1, 3, 9)
    g = g.at[:, :, 0].add(0.8)
    nx, ny, nz = normals[..., 0], normals[..., 1], normals[..., 2]
    a0, a1, a2 = _A
    c0, c1, c2 = _C
    Y = jnp.stack([
        jnp.full_like(nx, a0 * c0),
        -a1 * c1 * ny,
        a1 * c1 * nz,
        -a1 * c1 * nx,
        a2 * c2 * nx * ny,
        -a2 * c2 * ny * nz,
        a2 * c2 * _D0 * (3 * nz**2 - 1),
        -a2 * c2 * nx * nz,
        a2 * c2 * 0.5 * (nx**2 - ny**2),
    ], -1)  # [B, V, 9]
    return jnp.einsum("bvk,bck->bvc", Y, g)


# -------------------------------------------------------------- rasterization
def _cross2(a, b):
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def _bin_triangles(xy, tris, H, W, tile, K):
    """Bin triangles into fixed-capacity per-tile candidate lists.

    xy [V, 2] screen coords (one frame). Returns cand [n_tiles, K] triangle
    ids, -1 padded. A triangle is assigned to the <=2x2 block of tiles
    covering its bbox (face triangles are a few pixels; a triangle spanning
    more than 2 tiles in either axis loses the far tiles — document'd cap)."""
    n_tx = -(-W // tile)
    n_ty = -(-H // tile)
    n_tiles = n_tx * n_ty
    T = tris.shape[0]

    p = xy[tris]  # [T, 3, 2]
    lo = jnp.min(p, axis=1)
    hi = jnp.max(p, axis=1)
    t_lo = jnp.floor(lo / tile).astype(jnp.int32)
    t_hi = jnp.floor(hi / tile).astype(jnp.int32)
    # clip to the image's tile range (offscreen triangles become empty)
    t_lo = jnp.clip(t_lo, 0, jnp.array([n_tx - 1, n_ty - 1]))
    t_hi_c = jnp.clip(t_hi, -1, jnp.array([n_tx - 1, n_ty - 1]))
    offscreen = (hi[:, 0] < 0) | (hi[:, 1] < 0) | (lo[:, 0] >= W) | (lo[:, 1] >= H)

    tile_ids, tri_ids = [], []
    tri_arange = jnp.arange(T, dtype=jnp.int32)
    for dy in (0, 1):
        for dx in (0, 1):
            txs = t_lo[:, 0] + dx
            tys = t_lo[:, 1] + dy
            valid = ((txs <= t_hi_c[:, 0]) & (tys <= t_hi_c[:, 1])
                     & (~offscreen))
            tile_ids.append(jnp.where(valid, tys * n_tx + txs, n_tiles))
            tri_ids.append(tri_arange)
    tile_of = jnp.concatenate(tile_ids)  # [4T], n_tiles = invalid sentinel
    tri_of = jnp.concatenate(tri_ids)

    order = jnp.argsort(tile_of)  # jnp.argsort is stable
    tile_sorted = tile_of[order]
    tri_sorted = tri_of[order]
    starts = jnp.searchsorted(tile_sorted, jnp.arange(n_tiles))
    idx = starts[:, None] + jnp.arange(K)[None, :]
    idx_c = jnp.clip(idx, 0, 4 * T - 1)
    cand = tri_sorted[idx_c]
    in_tile = tile_sorted[idx_c] == jnp.arange(n_tiles)[:, None]
    return jnp.where(in_tile, cand, -1)  # [n_tiles, K]


def _raster_hard(xy, z, tris, H, W, tile, K):
    """Hard z-buffer visibility: per-pixel winning triangle id [H, W]
    (-1 = background). Pure gathers + batched barycentric tests + argmin —
    no scatters, static shapes."""
    n_tx = -(-W // tile)
    n_ty = -(-H // tile)
    cand = _bin_triangles(xy, tris, H, W, tile, K)  # [n_tiles, K]

    # pixel centers of one tile
    ii, jj = jnp.meshgrid(jnp.arange(tile), jnp.arange(tile), indexing="ij")
    pix_local = jnp.stack([jj.reshape(-1) + 0.5, ii.reshape(-1) + 0.5], -1)

    tri_xy = xy[tris]  # [T, 3, 2]
    tri_z = z[tris]  # [T, 3]

    def per_tile(tile_idx, cand_row):
        ty = tile_idx // n_tx
        tx = tile_idx % n_tx
        pix = pix_local + jnp.array([tx * tile, ty * tile], jnp.float32)
        cr = jnp.maximum(cand_row, 0)
        pv = tri_xy[cr]  # [K, 3, 2]
        zv = tri_z[cr]  # [K, 3]
        v0, e1, e2 = pv[:, 0], pv[:, 1] - pv[:, 0], pv[:, 2] - pv[:, 0]
        den = _cross2(e1, e2)  # [K]
        d = pix[:, None, :] - v0[None, :, :]  # [P, K, 2]
        w1 = _cross2(d, e2[None]) / jnp.where(den == 0, 1.0, den)
        w2 = _cross2(e1[None], d) / jnp.where(den == 0, 1.0, den)
        w0 = 1.0 - w1 - w2
        inside = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0)
                  & (jnp.abs(den)[None] > 1e-12) & (cand_row >= 0)[None])
        zp = w0 * zv[None, :, 0] + w1 * zv[None, :, 1] + w2 * zv[None, :, 2]
        zp = jnp.where(inside, zp, jnp.inf)
        best = jnp.argmin(zp, axis=1)  # [P]
        hit = jnp.take_along_axis(zp, best[:, None], 1)[:, 0] < jnp.inf
        return jnp.where(hit, cand_row[best], -1)

    tri_id = jax.vmap(per_tile)(jnp.arange(n_tx * n_ty), cand)  # [n_tiles, P]
    img = tri_id.reshape(n_ty, n_tx, tile, tile).transpose(0, 2, 1, 3)
    return img.reshape(n_ty * tile, n_tx * tile)[:H, :W]


def rasterize_attributes(xy, z, attrs, tris, H, W, tile=16, K=128):
    """One frame: xy [V,2] (differentiable), z [V] positive depth,
    attrs [V, C] vertex attributes -> image [H, W, C], mask [H, W].

    Visibility is hard (stop_gradient); barycentrics are re-derived
    differentiably from xy so d(image)/d(xy, attrs) exists."""
    tri_id = _raster_hard(
        jax.lax.stop_gradient(xy), jax.lax.stop_gradient(z), tris, H, W,
        tile, K,
    )  # [H, W]
    flat = tri_id.reshape(-1)
    valid = flat >= 0
    t = jnp.maximum(flat, 0)
    vid = tris[t]  # [P, 3]
    pv = xy[vid]  # [P, 3, 2] differentiable
    ii, jj = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    pix = jnp.stack([jj.reshape(-1) + 0.5, ii.reshape(-1) + 0.5], -1)
    v0, e1, e2 = pv[:, 0], pv[:, 1] - pv[:, 0], pv[:, 2] - pv[:, 0]
    den = _cross2(e1, e2)
    den = jnp.where(jnp.abs(den) < 1e-12, 1.0, den)
    d = pix - v0
    w1 = _cross2(d, e2) / den
    w2 = _cross2(e1, d) / den
    w0 = 1.0 - w1 - w2
    av = attrs[vid]  # [P, 3, C]
    out = (w0[:, None] * av[:, 0] + w1[:, None] * av[:, 1]
           + w2[:, None] * av[:, 2])
    out = jnp.where(valid[:, None], out, 0.0)
    return out.reshape(H, W, -1), valid.reshape(H, W)


# ------------------------------------------------------------------- facade
class Render3DMM:
    """The reference's Render_3DMM facade (render_3dmm.py:83-209): camera-
    space geometry [B, V, 3] + per-vertex albedo [B, V, 3] (0..255) +
    SH light [B, 27] -> [B, H, W, 4] RGBA (RGB 0..255, A in {0,1})."""

    def __init__(self, focal, h, w, tris, tile=16, K=128):
        self.focal = float(focal)
        self.h, self.w = int(h), int(w)
        self.tris = jnp.asarray(tris, jnp.int32)
        self.tile, self.K = tile, K

    def project(self, verts):
        """Camera space -> screen, the tracker's convention
        (geo_transform.py: u = f*x/z + cx, v = -f*y/z + cy, camera -z)."""
        z = jnp.maximum(-verts[..., 2], 1e-6)
        u = self.focal * verts[..., 0] / z + self.w / 2.0
        v = -self.focal * verts[..., 1] / z + self.h / 2.0
        return jnp.stack([u, v], -1), z

    def __call__(self, rott_geometry, texture, gamma):
        normals = vertex_normals(rott_geometry, self.tris)
        color = texture * sh_irradiance(normals, gamma)  # [B, V, 3]
        xy, z = self.project(rott_geometry)

        def one(xy_b, z_b, col_b):
            img, mask = rasterize_attributes(
                xy_b, z_b, col_b, self.tris, self.h, self.w,
                tile=self.tile, K=self.K,
            )
            return jnp.concatenate(
                [jnp.clip(img, 0.0, 255.0), mask[..., None].astype(img.dtype)],
                -1,
            )

        return jax.vmap(one)(xy, z, color)
