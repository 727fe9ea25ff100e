from .diff import DiffResult, diff

__all__ = ["DiffResult", "diff"]
