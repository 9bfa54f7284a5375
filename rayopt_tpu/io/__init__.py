from .zemax import zmx_to_system, agf_to_material  # noqa: F401
from .oslo import len_to_system, olc_to_system, glc_to_material  # noqa: F401
from .codev import codevxml_to_material  # noqa: F401
from .rii import rii_to_material  # noqa: F401


def __getattr__(name):
    # the catalog store loads lazily: an eager import would place
    # rayopt_tpu.io.library in sys.modules before runpy executes
    # `python -m rayopt_tpu.io.library`, tripping the double-import
    # RuntimeWarning every CLI user sees
    if name in ("Library", "library"):
        import importlib
        mod = importlib.import_module(__name__ + ".library")
        return mod if name == "library" else mod.Library
    raise AttributeError("module %r has no attribute %r"
                         % (__name__, name))
