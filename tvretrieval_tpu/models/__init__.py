from tvretrieval_tpu.models.cal import CALConfig, CALWithSub
from tvretrieval_tpu.models.excl import ExCL, ExCLConfig
from tvretrieval_tpu.models.mee import MEE, MEEConfig
from tvretrieval_tpu.models.rnn import RNNEncoder
from tvretrieval_tpu.models.xml import XML, XMLConfig

__all__ = [
    "XML", "XMLConfig",
    "MEE", "MEEConfig",
    "CALWithSub", "CALConfig",
    "ExCL", "ExCLConfig",
    "RNNEncoder",
]
