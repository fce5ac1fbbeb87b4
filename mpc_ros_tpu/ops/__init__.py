from . import poly, frames

__all__ = ["poly", "frames"]
