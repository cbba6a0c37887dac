from . import (  # noqa: F401
    aggregates,
    dedup,
    matview,
    multimodal,
    relational,
    similarity,
    temporal,
    text,
    windows,
)
