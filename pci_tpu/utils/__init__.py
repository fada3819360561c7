"""Host-side utilities: visualization and media generation."""

from .profiling import StepTimer, trace
from .visualize import PcdsVisualizer

__all__ = ["PcdsVisualizer", "StepTimer", "trace"]
