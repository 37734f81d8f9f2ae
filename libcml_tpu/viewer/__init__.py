from libcml_tpu.viewer.export import (
    export_ply,
    export_trajectory_ply,
    export_html_viewer,
    snapshot,
)

__all__ = [
    "export_ply", "export_trajectory_ply", "export_html_viewer", "snapshot",
]
