from .catalog import Query, registry

__all__ = ["Query", "registry"]
