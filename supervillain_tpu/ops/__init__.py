from .lattice import Lattice, Lattice2D, fft_coordinates
from .form import Form
from .calculus import (
    d, delta, face_sum, coface_sum, laplacian, star, wedge, push, pull, inner,
)
from .sparse import delta_sparse, d_sparse, coface_sum_at, face_sum_at
