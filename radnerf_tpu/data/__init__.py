"""Host-side data layer: dataset providers + ray/pose/audio helpers."""

from .provider import PoseAudioDataset, TalkingHeadDataset, load_audio_features
from .rays import (
    convert_poses,
    euler_xyz_to_matrix,
    get_audio_features,
    get_bg_coords,
    get_rays,
    matrix_to_euler_xyz,
    nerf_matrix_to_ngp,
    polygon_area,
    smooth_camera_path,
)

__all__ = [
    "PoseAudioDataset",
    "TalkingHeadDataset",
    "load_audio_features",
    "convert_poses",
    "euler_xyz_to_matrix",
    "get_audio_features",
    "get_bg_coords",
    "get_rays",
    "matrix_to_euler_xyz",
    "nerf_matrix_to_ngp",
    "polygon_area",
    "smooth_camera_path",
]
