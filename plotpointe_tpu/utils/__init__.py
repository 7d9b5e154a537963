from plotpointe_tpu.utils.logging import log_event
from plotpointe_tpu.utils.prng import set_seeds, key_seq

__all__ = ["log_event", "set_seeds", "key_seq"]
