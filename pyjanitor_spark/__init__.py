"""pyjanitor_spark — a PySpark-native re-expression of pyjanitor's verb
library (reference: pyjanitor-devs/pyjanitor v0.29.2).

Every verb is a pure function ``f(df, ...) -> DataFrame`` building a lazy
Spark logical plan; Catalyst does the optimization.  Three usage forms:

1. plain functions:      ``pj.clean_names(df)``
2. transform-friendly:   ``df.transform(lambda d: pj.clean_names(d))``
3. method registration:  ``pj.register_dataframe_methods()`` then
   ``df.clean_names()`` — mirrors the reference's pandas_flavor pattern
   (``janitor/spark/backend.py:19-45``).
"""

from __future__ import annotations

from pyjanitor_spark import functions  # noqa: F401
from pyjanitor_spark.errors import JanitorError  # noqa: F401
from pyjanitor_spark.functions.math import (  # noqa: F401
    ecdf,
    exp,
    log,
    logit,
    normal_cdf,
    probit,
    sigmoid,
    softmax,
    z_score,
)
from pyjanitor_spark.operators import *  # noqa: F401,F403
from pyjanitor_spark.operators import __dict__ as _ops_dict
from pyjanitor_spark.sources import (  # noqa: F401
    read_bucketed_table,
    read_commandline,
    read_csvs,
    read_orc,
    read_table,
    write_bucketed_table,
    write_csv,
    write_json,
    write_orc,
    write_parquet,
    write_zordered,
    zorder_key,
    xlsx_cells,
    xlsx_table,
)
from pyjanitor_spark.utils import (  # noqa: F401
    ORDER_COL,
    SALT_COL,
    DropLabel,
    count_distinct_exact,
    ensure_order_column,
    get_index_labels,
    patterns,
    resolve_columns,
    skew_join,
)

__version__ = "0.1.0"

# Minimum supported Spark.  Enforced, not advisory: the capped
# ngram_jaccard path (operators/dedup.py) relies on lazy-checkpoint
# LogicalRDDs carrying their origin subtree's size statistics (Spark
# 3.4+); on older engines the bogus-small estimate re-opens the
# broadcast-the-pair-aggregate driver-OOM plan (r10 incident, ADVICE
# r13).  tests/test_plan_properties.py pins the plan shape on top.
MIN_SPARK_VERSION = (3, 4)


def _check_spark_version() -> None:
    import pyspark

    parts = pyspark.__version__.split(".")
    ver = tuple(int(p) for p in parts[:2] if p.isdigit())
    if ver < MIN_SPARK_VERSION:
        raise ImportError(
            f"pyjanitor_spark requires Spark >= "
            f"{'.'.join(map(str, MIN_SPARK_VERSION))} (lazy-checkpoint "
            f"statistics semantics); found pyspark {pyspark.__version__}"
        )


_check_spark_version()


def _public_verbs():
    import inspect

    from pyjanitor_spark import operators as _ops

    out = {}
    for name in dir(_ops):
        if name.startswith("_"):
            continue
        fn = getattr(_ops, name)
        if not inspect.isfunction(fn):
            continue
        params = list(inspect.signature(fn).parameters)
        # only df-first verbs become DataFrame methods; session-first
        # builders (expand_grid) and Column helpers stay module-level
        if params and params[0] == "df":
            out[name] = fn
    return out


def register_dataframe_methods() -> None:
    """Monkey-patch every verb onto ``pyspark.sql.DataFrame`` as a method
    (the reference's registration pattern, ``janitor/spark/backend.py``)."""
    from pyspark.sql import DataFrame

    for name, fn in _public_verbs().items():
        setattr(DataFrame, name, fn)
