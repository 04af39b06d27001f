from .mesh import chain_mesh, chain_space_mesh
from .fleet import Fleet, sample_fleet
from .fused_fleet import sample_fused_fleet
from . import distributed
