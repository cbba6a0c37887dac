from . import hashing, scalar, udtfs  # noqa: F401
