from mastermetastyletransfer_tpu.train.schedule import make_lr_schedule  # noqa: F401
from mastermetastyletransfer_tpu.train.state import (  # noqa: F401
    TrainState, create_train_state, trainable_labels,
)
from mastermetastyletransfer_tpu.train.step import (  # noqa: F401
    make_train_step, make_meta_train_step, prepare_batch_for_model,
)
