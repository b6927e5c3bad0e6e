from . import text, vectors  # noqa: F401

__all__ = ["text", "vectors"]
