from plotpointe_tpu.ops.segment import (
    segment_softmax_attention,
    segment_sum,
    spmm,
)
from plotpointe_tpu.ops.topk_kernel import topk_mips_pallas, topk_mips_xla

__all__ = [
    "segment_softmax_attention",
    "segment_sum",
    "spmm",
    "topk_mips_pallas",
    "topk_mips_xla",
]
