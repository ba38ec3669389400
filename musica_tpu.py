"""Short import alias for the framework package.

``import musica_tpu`` re-exports
``metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu``
so user code doesn't have to spell out the full repository name.
"""

import sys as _sys

import metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu as _pkg
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu import *  # noqa: F401,F403
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu import (  # noqa: F401
    config, models, ops, parallel, testing, utils,
)

# make `musica_tpu.x.y` submodule imports resolve to the real package
for _name, _mod in list(_sys.modules.items()):
    if _name.startswith(_pkg.__name__ + "."):
        _sys.modules["musica_tpu." + _name[len(_pkg.__name__) + 1:]] = _mod

MusicaConfig = config.MusicaConfig
__version__ = _pkg.__version__
