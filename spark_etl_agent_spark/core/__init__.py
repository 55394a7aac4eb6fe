from .session import SparkManager, get_or_create_session

__all__ = ["SparkManager", "get_or_create_session"]
