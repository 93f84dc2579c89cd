from rlpyt_tpu.models.mlp import MlpModel
from rlpyt_tpu.models.conv import Conv2dModel, Conv2dHeadModel
from rlpyt_tpu.models.dqn import (
    DqnMlpModel,
    AtariDqnModel,
    AtariCatDqnModel,
    AtariR2d1Model,
    DuelingHead,
    DistributionalDuelingHead,
)
from rlpyt_tpu.models.pg import (
    AtariFfModel,
    AtariLstmModel,
    MujocoFfModel,
    MujocoLstmModel,
)
from rlpyt_tpu.models.qpg import MuMlpModel, QofMuMlpModel, PiMlpModel
from rlpyt_tpu.models.running_norm import RunningMeanStd
