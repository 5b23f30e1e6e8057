from dpr_scale_tpu.optim.madgrad import madgrad
from dpr_scale_tpu.optim.factory import make_optimizer

__all__ = ["madgrad", "make_optimizer"]
