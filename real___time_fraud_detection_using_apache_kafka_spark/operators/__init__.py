from . import aggregates, dedup, relational, similarity, text, windows  # noqa: F401
