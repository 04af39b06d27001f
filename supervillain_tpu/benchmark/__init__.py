from .form_kernels import benchmark_form_kernels
from .scaling import scaling_efficiency
