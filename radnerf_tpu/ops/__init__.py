"""TPU-native compute kernels (the reference's four CUDA extensions, rebuilt)."""

from .activation import trunc_exp
from .freq_encode import freq_encode, freq_output_dim
from .grid_encode import (
    GridSpec,
    build_packed_table,
    grid_encode,
    grid_encode01,
    grid_encode01_packed,
    grid_encode_packed,
    grid_total_variation,
)
from .marching import (
    MarchConfig,
    compact_samples,
    composite_rays,
    march_rays,
    occupancy_lookup,
)
from .encoding import get_encoder
from .morton import morton3d, morton3d_invert, morton_dilate, packbits, unpackbits
from .ray_aabb import near_far_from_aabb
from .sampling import sample_pdf, sph_from_ray
from .sh_encode import sh_encode, sh_output_dim

__all__ = [
    "trunc_exp",
    "freq_encode",
    "freq_output_dim",
    "GridSpec",
    "build_packed_table",
    "grid_encode",
    "grid_encode01",
    "grid_encode01_packed",
    "grid_encode_packed",
    "grid_total_variation",
    "MarchConfig",
    "compact_samples",
    "composite_rays",
    "march_rays",
    "occupancy_lookup",
    "get_encoder",
    "sample_pdf",
    "sph_from_ray",
    "morton3d",
    "morton3d_invert",
    "morton_dilate",
    "packbits",
    "unpackbits",
    "near_far_from_aabb",
    "sh_encode",
    "sh_output_dim",
]
