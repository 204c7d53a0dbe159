from cips3d_tpu.train.losses import d_logistic_loss, g_nonsaturating_loss, r1_penalty  # noqa: F401
from cips3d_tpu.train.schedules import alpha_schedule, nerf_noise_schedule  # noqa: F401
from cips3d_tpu.train.state import TrainConfig, TrainState  # noqa: F401
from cips3d_tpu.train.step import init_train_state, make_train_step  # noqa: F401
