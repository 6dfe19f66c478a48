"""TPU kernels: MXU-native voxelization and future Pallas ops."""
from .matmul_voxelize import voxelize_matmul  # noqa: F401
