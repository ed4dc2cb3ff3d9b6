from .allocation import AllocSpec, allocate_ratio_to_parent, allocate_by_share
from .ranking import first_per_group, top_k_per_group, rank_capture

__all__ = [
    "AllocSpec",
    "allocate_ratio_to_parent",
    "allocate_by_share",
    "first_per_group",
    "top_k_per_group",
    "rank_capture",
]
