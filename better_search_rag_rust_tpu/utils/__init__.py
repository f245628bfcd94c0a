from .logging import get_logger, host_log  # noqa: F401
