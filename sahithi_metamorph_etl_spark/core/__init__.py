from .session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
