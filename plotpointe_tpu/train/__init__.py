from plotpointe_tpu.train.losses import bpr_loss, bce_loss
from plotpointe_tpu.train.evaluate import sampled_eval
from plotpointe_tpu.train.trainer import Trainer, TrainState

__all__ = ["bpr_loss", "bce_loss", "sampled_eval", "Trainer", "TrainState"]
