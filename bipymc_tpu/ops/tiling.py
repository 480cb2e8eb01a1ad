"""Shared tile-padding helpers for the Pallas kernels in this package."""


def round_up(x: int, m: int) -> int:
    """Smallest multiple of ``m`` that is ≥ ``x``."""
    return (x + m - 1) // m * m
