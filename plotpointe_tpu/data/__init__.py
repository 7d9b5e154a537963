from plotpointe_tpu.data.splits import Splits, build_splits, build_node_maps
from plotpointe_tpu.data.synthetic import synthetic_interactions, synthetic_catalog

__all__ = [
    "Splits",
    "build_splits",
    "build_node_maps",
    "synthetic_interactions",
    "synthetic_catalog",
]
