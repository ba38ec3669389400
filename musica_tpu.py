"""Short import alias for the framework package.

``import musica_tpu`` re-exports
``metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu``
so user code doesn't have to spell out the full repository name.

Every leaf module is imported eagerly and aliased in ``sys.modules`` under
its ``musica_tpu.*`` dotted name BEFORE user code can ask for it: a plain
``import musica_tpu.models.musica`` then resolves from ``sys.modules`` and
is the SAME module object as the canonically-imported one.  (Without the
eager imports, Python's import machinery would re-execute the file under
the alias name, creating a duplicate module with its own jit caches.)
"""

import sys as _sys

import metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu as _pkg
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu import *  # noqa: F401,F403
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu import (  # noqa: F401
    cli, config, models, ops, parallel, testing, utils,
)
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.models import (  # noqa: F401
    golden, musica,
)
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.ops import (  # noqa: F401
    clahe, curves, gradation, noise, normalize, pyramid, stats,
)
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.ops.pallas import (  # noqa: F401
    clahe_apply, fused_hist, histogram,
)
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.parallel import (  # noqa: F401
    sharding,
)
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.testing import (  # noqa: F401
    analysis, campaign, metrics, perturb, phantoms,
)
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.utils import (  # noqa: F401
    aot_cache, debug, io, render, report, viewer,
)

# make `musica_tpu.x.y` submodule imports resolve to the real package
for _name, _mod in list(_sys.modules.items()):
    if _name.startswith(_pkg.__name__ + "."):
        _sys.modules["musica_tpu." + _name[len(_pkg.__name__) + 1:]] = _mod

MusicaConfig = config.MusicaConfig
__version__ = _pkg.__version__
