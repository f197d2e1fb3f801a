from .geocode import (  # noqa: F401
    forward_geocode,
    normalize_text,
    proximity_boost,
    reverse_geocode_endpoint,
    score_expr,
)
