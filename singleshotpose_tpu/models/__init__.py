from .darknet import DarknetSpec, fold_batchnorm  # noqa: F401
from . import layers  # noqa: F401
from . import quantize  # noqa: F401
