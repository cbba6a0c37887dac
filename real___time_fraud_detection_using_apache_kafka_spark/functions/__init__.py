from . import hashing, scalar  # noqa: F401
