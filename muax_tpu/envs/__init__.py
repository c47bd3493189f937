"""Pure-JAX vectorized environments and wrappers."""

from muax_tpu.envs.base import (
    Environment,
    EnvSpec,
    AutoResetWrapper,
    AutoResetState,
)
from muax_tpu.envs.atari import AtariPreprocessing, AtariVectorPool
from muax_tpu.envs.cartpole import CartPole
from muax_tpu.envs.catch import Catch
from muax_tpu.envs.connect4 import ConnectFour
from muax_tpu.envs.pixel import PixelCatch, PixelObsEnv
from muax_tpu.envs.tictactoe import TicTacToe
from muax_tpu.envs.wrappers import (
    ActionHistoryEnv,
    FrameStackingEnv,
    PoolFrameStacking,
)
from muax_tpu.envs.open_spiel_adapter import (
    AlphaZeroPlanes,
    OpenSpielVectorPool,
)
from muax_tpu.envs.registry import make, register, registered
