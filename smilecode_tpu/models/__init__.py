from smilecode_tpu.models.modet import ModeT, Encoder
from smilecode_tpu.models.im2grid import Im2grid
from smilecode_tpu.models.pcnet import PCNet
from smilecode_tpu.models.prnet import PRNet, PRNetPlusPlus
from smilecode_tpu.models.rcn import VTN, RCN
from smilecode_tpu.models.rdn import RDN
from smilecode_tpu.models.registry import build_model

__all__ = [
    "ModeT", "Encoder", "Im2grid", "PCNet", "PRNet", "PRNetPlusPlus",
    "VTN", "RCN", "RDN", "build_model",
]
