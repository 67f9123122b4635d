from .misc import normalize_axis, to_list, to_numpy, to_python
from . import nested
from .nested import (
    flatten,
    deflatten,
    nested_merge,
    nested_update,
    nested_op,
    get_by_path,
    set_by_path,
)
