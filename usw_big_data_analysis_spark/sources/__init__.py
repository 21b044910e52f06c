from .tables import TABLES, load_table, register_views  # noqa: F401
from .io import (  # noqa: F401
    read_csv,
    read_text_lines,
    sink_csv,
    sink_json,
    roundtrip_csv,
)
