"""Retrieval layer (BASELINE.json config #5): the learned W/H factors serve
as user/item embedding tables scored by top-k maximum-inner-product search,
evaluated with recall@k on held-out interactions."""

from nmftpu.retrieval.mips import (topk_mips, topk_mips_blocked,
                                   topk_mips_certified,
                                   topk_mips_excluded)
from nmftpu.retrieval.evaluate import recall_at_k
from nmftpu.kernels.mips_reservoir import reservoir_topk_mips

__all__ = ["topk_mips", "topk_mips_blocked", "topk_mips_certified",
           "topk_mips_excluded", "recall_at_k", "reservoir_topk_mips"]
