"""Utilities: mesh extraction, color space conversion, logging helpers."""

from .color import linear_to_srgb, srgb_to_linear
from .mesh import extract_geometry, marching_cubes, save_mesh_ply

__all__ = [
    "linear_to_srgb",
    "srgb_to_linear",
    "extract_geometry",
    "marching_cubes",
    "save_mesh_ply",
]
