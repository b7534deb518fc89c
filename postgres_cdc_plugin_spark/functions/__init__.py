from . import scalar

__all__ = ["scalar"]
