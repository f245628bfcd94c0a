from .distance import cosine_distance_matrix, normalize_rows  # noqa: F401
from .topk import merge_topk, serial_topk  # noqa: F401
from .engine import SearchEngine  # noqa: F401
