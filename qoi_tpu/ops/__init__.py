from .scans import exclusive_cumsum, last_true_index, run_segmentation  # noqa: F401
from .table import pack_rgba, table_replay  # noqa: F401
from .compact import compact_bytes  # noqa: F401
