from .boxes import instance_info, floor_box, wall_boxes_from_planes
from .pipeline import LabelerConfig, generate_scene_labels

__all__ = [
    "instance_info",
    "floor_box",
    "wall_boxes_from_planes",
    "LabelerConfig",
    "generate_scene_labels",
]
