from . import (  # noqa: F401
    aggregates,
    dedup,
    multimodal,
    relational,
    similarity,
    temporal,
    text,
    windows,
)
