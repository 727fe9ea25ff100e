from .warehouse import LayeredWarehouse

__all__ = ["LayeredWarehouse"]
