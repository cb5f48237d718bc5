from .argmax import latest_state
from .asof import asof_join
from .rangejoin import band_join
from .surrogate import with_dense_ids
from .upsert import new_dimension_rows

__all__ = [
    "asof_join",
    "band_join",
    "latest_state",
    "new_dimension_rows",
    "with_dense_ids",
]
