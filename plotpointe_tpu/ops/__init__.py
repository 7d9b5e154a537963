from plotpointe_tpu.ops.segment import (
    segment_softmax_attention,
    segment_sum,
    spmm,
)

__all__ = ["segment_softmax_attention", "segment_sum", "spmm"]
