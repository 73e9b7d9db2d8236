from .layout import classify_lines, prepare_blocks  # noqa: F401
from .assembly import assemble_records  # noqa: F401
from .output import to_census_csv  # noqa: F401
