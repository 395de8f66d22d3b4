"""Model layer: the audio-conditioned NeRF field and its rendering engine."""

from .network import (
    NetworkConfig,
    encode_audio,
    field_density,
    field_forward,
    forward_torso,
    init_params,
    param_groups,
    precompute_packed_tables,
)
from .renderer import (
    GRID_SIZE,
    RenderConfig,
    RendererState,
    bilinear_sample_2d,
    compute_occ_bbox,
    mark_untrained_grid,
    render_rays,
    reset_extra_state,
    smooth_audio_code,
    update_density_grid,
    update_torso_grid,
)

__all__ = [
    "NetworkConfig",
    "encode_audio",
    "field_density",
    "field_forward",
    "forward_torso",
    "init_params",
    "param_groups",
    "precompute_packed_tables",
    "GRID_SIZE",
    "RenderConfig",
    "RendererState",
    "bilinear_sample_2d",
    "compute_occ_bbox",
    "mark_untrained_grid",
    "render_rays",
    "reset_extra_state",
    "smooth_audio_code",
    "update_density_grid",
    "update_torso_grid",
]
