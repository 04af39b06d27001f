from .autocorrelation import autocorrelation, autocorrelation_time
from .blocking import Blocking
from .bootstrap import Bootstrap
from .uncertain import Uncertain
from . import comparison_plot
from . import scaling
