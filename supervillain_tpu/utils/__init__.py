from .timer import Timer
from .prng import fold_key, split_tree
