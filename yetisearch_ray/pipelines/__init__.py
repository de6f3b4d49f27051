from . import ann, cluster, dedup, hybrid, multimodal, relational, textstats

__all__ = ["ann", "cluster", "dedup", "hybrid", "multimodal", "relational",
           "textstats"]
