"""Training engine: TrainState, optimizer factory, jitted step builders, loop."""

from syncvsr_tpu.engine.state import TrainState, create_train_state, make_optimizer  # noqa: F401
from syncvsr_tpu.engine.steps import build_eval_step, build_train_step  # noqa: F401
