from mcqueens.utils import checkpoint, profiling  # noqa: F401
