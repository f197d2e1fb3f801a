from .checkpoint import LineageLog, run_stage  # noqa: F401
from .bucketing import (  # noqa: F401
    colocated_join_plan,
    compact_published,
    write_bucketed,
)
