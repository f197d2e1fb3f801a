from .geocode import (  # noqa: F401
    autocomplete,
    forward_geocode,
    normalize_text,
    proximity_boost,
    reverse_geocode_endpoint,
    score_expr,
)
from . import scalars  # noqa: F401
from .geocodejson import (  # noqa: F401
    geocodejson_feature,
    geocodejson_response,
    to_geocodejson,
)
