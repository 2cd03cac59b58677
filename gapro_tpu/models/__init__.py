from .inference import TestConfig, get_instances, select_proposals
from .isbnet import ISBNet, ISBNetConfig

__all__ = [
    "ISBNet",
    "ISBNetConfig",
    "TestConfig",
    "get_instances",
    "select_proposals",
]
