from vct_tpu.train.optimizers import build_optimizer, CosineAnnealingLR, ReduceLROnPlateau  # noqa: F401
from vct_tpu.train.earlystop import EarlyStopping  # noqa: F401
from vct_tpu.train.state import TrainState  # noqa: F401
