"""Model zoo (L2 of the reference layer map): all three generations of the
reference's interpolation models plus the FlowNet3D backbone."""

from .flownet3d import FlowNet3D
from .isapci import ISAPCInet, PointINet2
from .isapci_asym import ISAPCInetAsym
from .pointinet import PointINet
from .polypci import PolyPCI

__all__ = [
    "FlowNet3D",
    "ISAPCInet",
    "ISAPCInetAsym",
    "PointINet2",
    "PointINet",
    "PolyPCI",
]
