from vsrcic_tpu.train.common import (  # noqa: F401
    TrainState, adam, apply_grads, init_train_state, nll_loss, planner_lr,
    set_learning_rate, step_lr)
from vsrcic_tpu.train.captioner import (  # noqa: F401
    CaptionerSCSTTrainer, CaptionerXETrainer, scst_loss_fn, xe_loss_fn)
from vsrcic_tpu.train.planners import (  # noqa: F401
    SSPTrainer, SinkhornTrainer, sinkhorn_pairs_from_grids)
