from .lattice import Lattice, Lattice2D, fft_coordinates
from .calculus import (
    d, delta, face_sum, coface_sum, laplacian, star, wedge, push, pull, inner,
)
