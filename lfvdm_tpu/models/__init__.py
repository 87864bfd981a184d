from .unet import UNetVideoModel
from .nn import timestep_embedding, GroupNorm32
