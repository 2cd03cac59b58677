from .nms import matrix_nms, standard_nms_host, weighted_mask_iou
from .voxelize import VoxelMaps, devoxelize, voxel_feats_mean, voxelize

__all__ = [
    "voxelize",
    "voxel_feats_mean",
    "devoxelize",
    "VoxelMaps",
    "matrix_nms",
    "standard_nms_host",
    "weighted_mask_iou",
]
