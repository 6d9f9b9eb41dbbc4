from .logging_utils import set_logging_format, timeit, set_seed
from .colormap import jet_colormap, apply_jet
from . import vis
