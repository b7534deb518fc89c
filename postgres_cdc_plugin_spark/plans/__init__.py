from . import inspect

__all__ = ["inspect"]
