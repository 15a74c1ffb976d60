from .scalars import (
    dec,
    money_round,
    net_price,
    null_safe_sum,
    pct_to_fraction,
    row_fingerprint,
)

__all__ = [
    "dec",
    "money_round",
    "net_price",
    "null_safe_sum",
    "pct_to_fraction",
    "row_fingerprint",
]
