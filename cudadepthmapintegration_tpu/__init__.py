"""cudadepthmapintegration_tpu — TPU-native volumetric depth-map fusion.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``bastienjacquet/CudaDepthMapIntegration`` (Kitware, 2016): truncated
signed-distance ray-potential fusion of calibrated depth maps into a dense
voxel grid, isosurface extraction (marching cubes), and mesh coloration —
single chip to multi-host TPU meshes.
"""

__version__ = "0.1.0"

from .core import Camera, DepthMapView, RayPotential, VoxelGrid

__all__ = ["Camera", "DepthMapView", "RayPotential", "VoxelGrid", "__version__"]
