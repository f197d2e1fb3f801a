from .checkpoint import LineageLog, run_stage  # noqa: F401
