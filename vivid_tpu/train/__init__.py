from .step import TrainConfig, TrainState, init_train_state, make_train_step
from .snapshots import save_snapshot, load_snapshot
from .loop import training_loop
