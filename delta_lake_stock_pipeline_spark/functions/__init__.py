from . import temporal, vector

__all__ = ["temporal", "vector"]
