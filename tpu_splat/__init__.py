"""tpu-splat: a TPU-native 3D reconstruction framework.

Takes a video or set of images (including 360-degree equirectangular captures) and
produces a trained 3D Gaussian splat, delivered as .ply and compressed .spz artifacts,
plus optional metric-scale, floorplan, and object-layer outputs.

Capability parity target: the reference AWS "Open Source 3D Reconstruction Toolbox for
Gaussian Splats" (krishan44/pipeline-pointcloud). Where the reference shells out to GPU
engines (COLMAP/GLOMAP, Nerfstudio/gsplat, U2Net/SAM2) from a SageMaker container, this
framework implements the algorithms natively on TPU with JAX/XLA/Pallas/pjit.
"""

__version__ = "0.1.0"
