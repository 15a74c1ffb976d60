from .joins import broadcast_dim, semi_join, anti_join, theta_left_join, trim_join
from .windows import top1_per_group
from .bucketing import quantile_buckets

__all__ = [
    "broadcast_dim",
    "semi_join",
    "anti_join",
    "theta_left_join",
    "trim_join",
    "top1_per_group",
    "quantile_buckets",
]
