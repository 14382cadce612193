from .rd import rd_loss
from .train import TrainState, create_train_state, make_train_step

__all__ = ["rd_loss", "TrainState", "create_train_state", "make_train_step"]
