from aide_tpu.engine.state import (  # noqa: F401
    TrainState,
    DualTrainState,
    stack_trees,
    unstack_tree,
)
from aide_tpu.engine.steps import (  # noqa: F401
    make_supervised_train_step,
    make_coteach_train_step,
    make_eval_step,
    make_predict_step,
)
from aide_tpu.engine.trainer import Trainer  # noqa: F401
from aide_tpu.engine import checkpoint  # noqa: F401
