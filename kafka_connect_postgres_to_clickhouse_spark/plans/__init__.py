from .registry import REGISTRY, QuerySpec, register, load_all_queries

__all__ = ["REGISTRY", "QuerySpec", "register", "load_all_queries"]
