from rlpyt_tpu.distributions.categorical import Categorical, DistInfo
from rlpyt_tpu.distributions.gaussian import Gaussian, DistInfoStd
from rlpyt_tpu.distributions.epsilon_greedy import (
    EpsilonGreedy,
    CategoricalEpsilonGreedy,
)
