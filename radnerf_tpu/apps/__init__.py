"""Interactive applications: orbit camera + headless frame server (the GUI
replacement) and the streaming ASR feature extractor."""

from .frame_server import InteractiveApp, OrbitCamera

__all__ = ["InteractiveApp", "OrbitCamera"]
