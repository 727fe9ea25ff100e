from .money import dround, o_round

__all__ = ["dround", "o_round"]
