"""Host-side utilities: visualization and media generation."""

from .visualize import PcdsVisualizer

__all__ = ["PcdsVisualizer"]
