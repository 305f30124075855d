from .losses import cross_entropy, kl_distill_loss, mse_loss
from .plateau import PlateauState, plateau_init, plateau_update
from .step import TrainState, make_eval_step, make_train_step, init_train_state
