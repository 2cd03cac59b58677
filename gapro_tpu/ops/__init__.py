from .voxelize import voxelize, voxel_feats_mean, devoxelize, VoxelMaps

__all__ = ["voxelize", "voxel_feats_mean", "devoxelize", "VoxelMaps"]
