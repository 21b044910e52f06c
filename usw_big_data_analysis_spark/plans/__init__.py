"""Physical-plan inspection utilities (the 100 TB plan-shape contract)."""

from .inspect import audit, explain_formatted, shuffle_count  # noqa: F401
