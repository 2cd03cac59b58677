from .isbnet import ISBNet, ISBNetConfig

__all__ = ["ISBNet", "ISBNetConfig"]
