from .checkpoint import (checkpoint_exists, latest_epoch, load_checkpoint,
                         save_checkpoint)
from .precision import cast_batch, cast_params
from .schedule import cosine_hard_restarts_with_warmup
from .trainer import Trainer, TrainState, make_optimizer
