from .logging import get_logger
from .trees import param_count, param_bytes, tree_flatten_with_paths

__all__ = ["get_logger", "param_count", "param_bytes", "tree_flatten_with_paths"]
