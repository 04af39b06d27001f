from .h5 import (
    ensemble_to_h5, ensemble_from_h5, ensemble_extend_h5,
    generator_spec, generator_from_spec, action_from_h5, check_version,
)
