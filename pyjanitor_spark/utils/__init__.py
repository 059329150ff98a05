from pyjanitor_spark.utils.order import ORDER_COL, ensure_order_column
from pyjanitor_spark.utils.select import (
    DropLabel,
    get_index_labels,
    patterns,
    resolve_columns,
)
from pyjanitor_spark.utils.skew import SALT_COL, count_distinct_exact, skew_join
from pyjanitor_spark.utils.strings import clean_name, make_unique

__all__ = [
    "ORDER_COL",
    "ensure_order_column",
    "DropLabel",
    "patterns",
    "get_index_labels",
    "resolve_columns",
    "clean_name",
    "make_unique",
    "SALT_COL",
    "skew_join",
    "count_distinct_exact",
]
