from .autocorrelation import autocorrelation, autocorrelation_time
from .blocking import Blocking
from .bootstrap import Bootstrap
from .uncertain import Uncertain
from .comparison_plot import comparison_plot, histories, bootstraps
