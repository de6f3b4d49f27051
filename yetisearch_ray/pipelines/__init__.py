from . import ann, cluster, dedup, multimodal, relational, textstats

__all__ = ["ann", "cluster", "dedup", "multimodal", "relational",
           "textstats"]
