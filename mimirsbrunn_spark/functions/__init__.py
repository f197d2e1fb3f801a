from .geocode import (  # noqa: F401
    autocomplete,
    forward_geocode,
    normalize_text,
    proximity_boost,
    reverse_geocode_endpoint,
    score_expr,
)
from . import scalars  # noqa: F401
