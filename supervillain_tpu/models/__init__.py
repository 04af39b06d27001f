from .villain import Villain
from .worldline import Worldline
