from . import diff_drive, costs

__all__ = ["diff_drive", "costs"]
