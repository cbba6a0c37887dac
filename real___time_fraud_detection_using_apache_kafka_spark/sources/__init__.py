from .tables import load_table, load_tables, register_temp_views
from .txn_table import TxnTable, txn_batch_sink

__all__ = [
    "load_table",
    "load_tables",
    "register_temp_views",
    "TxnTable",
    "txn_batch_sink",
]
