from .zemax import zmx_to_system, agf_to_material  # noqa: F401
from .oslo import len_to_system, olc_to_system, glc_to_material  # noqa: F401
from .codev import codevxml_to_material  # noqa: F401
from .rii import rii_to_material  # noqa: F401
from .library import Library  # noqa: F401
