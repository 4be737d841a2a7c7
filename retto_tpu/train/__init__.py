from .losses import cls_loss, ctc_loss, db_loss
from .trainer import TrainState, make_mesh, make_train_step

__all__ = [
    "ctc_loss",
    "db_loss",
    "cls_loss",
    "TrainState",
    "make_mesh",
    "make_train_step",
]
