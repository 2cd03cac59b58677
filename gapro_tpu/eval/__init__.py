from .instance_eval import (
    S3DIS_INSTANCE_CLASSES,
    SCANNET_INSTANCE_CLASSES,
    ScanNetEval,
)
from .point_wise_eval import PointWiseEval
from .pseudo import pseudo_label_miou_scene, semantic_confusion
from .s3dis_eval import S3DISEval

__all__ = [
    "pseudo_label_miou_scene",
    "semantic_confusion",
    "ScanNetEval",
    "PointWiseEval",
    "S3DISEval",
    "SCANNET_INSTANCE_CLASSES",
    "S3DIS_INSTANCE_CLASSES",
]
