"""On-device prioritized trajectory replay."""

from muax_tpu.replay.buffer import (
    ReplayState,
    replay_init,
    replay_add,
    replay_sample,
    replay_update_priorities,
)
from muax_tpu.replay.tracer import (
    NStep,
    PNStep,
    Trajectory,
    TrajectoryReplayBuffer,
)
