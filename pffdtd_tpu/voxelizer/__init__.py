from pffdtd_tpu.voxelizer.grid import CartGrid  # noqa: F401
from pffdtd_tpu.voxelizer.vox import VoxScene, NEIGHBOR_VECTORS  # noqa: F401
