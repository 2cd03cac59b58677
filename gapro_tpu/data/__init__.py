from .synthetic import make_synthetic_scene

__all__ = ["make_synthetic_scene"]
