from .optimize import (
    fragment_distance,
    fragment_signature,
    hill_climb,
    lcp_uri_pattern,
    merge_fragments,
    optimizer_score,
    prf_by_sample,
)
from .train import train_kb

__all__ = [
    "prf_by_sample",
    "optimizer_score",
    "fragment_signature",
    "fragment_distance",
    "merge_fragments",
    "hill_climb",
    "lcp_uri_pattern",
    "train_kb",
]
