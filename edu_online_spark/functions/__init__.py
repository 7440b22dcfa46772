from .core import (  # noqa: F401
    csv_to_array,
    array_to_csv,
    day_bucket,
    fmt_ts,
)
from .vectors import cosine_similarity, dot, l2_norm  # noqa: F401
