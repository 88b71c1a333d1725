"""Interactive scene viewer (the `ns-viewer` / gc_viewer.py role)."""

from gaussctrl_tpu.viewer.server import ViewerServer
