"""Physical-plan inspection utilities (the 100 TB plan-shape contract)."""

from .inspect import (  # noqa: F401
    audit,
    explain_formatted,
    shuffle_count,
    unpartitioned_window_count,
)
