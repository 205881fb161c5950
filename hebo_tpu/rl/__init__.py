from .envs import Pendulum, PointGoal
from .pmdb import DynamicsEnsemble, pessimistic_rollout
from .rllg import GuidedSAC
from .sac import SAC, ReplayBuffer, SACState
from .simmer import SauteWrapper, SimmerController
