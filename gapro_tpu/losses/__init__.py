from .criterion import CriterionConfig, isbnet_loss, build_targets
from .matcher import hungarian_match

__all__ = ["CriterionConfig", "isbnet_loss", "build_targets", "hungarian_match"]
