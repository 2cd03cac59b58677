from .pseudo import pseudo_label_miou_scene, semantic_confusion

__all__ = ["pseudo_label_miou_scene", "semantic_confusion"]
