from plotpointe_tpu.models.gat import GATModel
from plotpointe_tpu.models.lightgcn import LightGCNModel
from plotpointe_tpu.models.fusion import FusionModel

__all__ = ["GATModel", "LightGCNModel", "FusionModel"]
