from .registry import QUERIES, oracle_sql, queries, register

# Importing the query modules populates the registry.
from . import queries_relational  # noqa: E402,F401
from . import queries_tpch  # noqa: E402,F401
from . import queries_tpch3  # noqa: E402,F401
from . import queries_metrics  # noqa: E402,F401
from . import queries_text  # noqa: E402,F401
from . import queries_temporal  # noqa: E402,F401
from . import queries_sketch  # noqa: E402,F401
from . import queries_analytics  # noqa: E402,F401
from . import queries_quality  # noqa: E402,F401
from . import queries_fraud  # noqa: E402,F401
from . import queries_graph  # noqa: E402,F401
from . import queries_timeseries  # noqa: E402,F401
from . import queries_stats  # noqa: E402,F401

__all__ = ["QUERIES", "queries", "oracle_sql", "register"]
