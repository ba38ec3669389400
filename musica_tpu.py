"""Short import alias for the framework package.

``import musica_tpu`` re-exports
``metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu``
so user code doesn't have to spell out the full repository name.

Every submodule is discovered with ``pkgutil.walk_packages`` (no
hand-maintained list -- new modules are covered automatically), imported
eagerly and aliased in ``sys.modules`` under its ``musica_tpu.*`` dotted
name BEFORE user code can ask for it: a plain
``import musica_tpu.models.musica`` then resolves from ``sys.modules`` and
is the SAME module object as the canonically-imported one.  (Without the
eager imports, Python's import machinery would re-execute the file under
the alias name, creating a duplicate module with its own jit caches.)
"""

import importlib as _importlib
import pkgutil as _pkgutil
import sys as _sys

import metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu as _pkg
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu import *  # noqa: F401,F403

for _info in _pkgutil.walk_packages(_pkg.__path__, _pkg.__name__ + "."):
    _importlib.import_module(_info.name)

# expose top-level subpackages as attributes (import * skips modules)
for _sub in ("cli", "config", "models", "ops", "parallel", "testing",
             "utils"):
    globals()[_sub] = _sys.modules[f"{_pkg.__name__}.{_sub}"]

# make `musica_tpu.x.y` submodule imports resolve to the real package
for _name, _mod in list(_sys.modules.items()):
    if _name.startswith(_pkg.__name__ + "."):
        _sys.modules["musica_tpu." + _name[len(_pkg.__name__) + 1:]] = _mod

MusicaConfig = config.MusicaConfig  # noqa: F821
__version__ = _pkg.__version__
