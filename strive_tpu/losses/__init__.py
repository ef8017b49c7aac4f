from .common import kl_normal, log_normal  # noqa: F401
