"""IO: orbax checkpoints with full resume, portable weight export, image writers."""

from mrijax.io.checkpoint import (
    CheckpointManager,
    save_params_npz,
    load_params_npz,
)
from mrijax.io.images import (
    make_grid,
    save_png,
    save_grid_png,
    to_uint8,
    percentile_window,
    volume_midslice_panel,
)

__all__ = [
    "CheckpointManager",
    "save_params_npz",
    "load_params_npz",
    "make_grid",
    "save_png",
    "save_grid_png",
    "to_uint8",
    "percentile_window",
    "volume_midslice_panel",
]
