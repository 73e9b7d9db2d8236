from .predicates import (  # noqa: F401
    HEADER_PHRASES,
    is_blank_col,
    is_continuation_line_col,
    is_header_text_col,
    is_numeric_token_col,
    py_is_continuation_line,
    py_is_header_text,
    py_is_numeric_token,
    py_starts_with_name,
    starts_with_name_col,
)
from .names import (  # noqa: F401
    alternate_name_col,
    name_parts_cols,
)
from .parsing import (  # noqa: F401
    extract_continuation_values,
    merge_positional,
    parse_name_line,
)
