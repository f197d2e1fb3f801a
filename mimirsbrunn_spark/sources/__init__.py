from .readers import (  # noqa: F401
    read_bano_csv,
    read_cosmogony_jsonl,
    read_navitia_pois,
    read_ntfs_stops,
    read_openaddresses_csv,
    read_table,
    resolve_osm_dependencies,
)
from .lifecycle import publish_table, read_published, merge_update, resolve_generation  # noqa: F401
