from pyjanitor_spark.sources.io import (  # noqa: F401
    read_commandline,
    read_csvs,
    read_jsonl,
    read_table,
    xlsx_cells,
    xlsx_table,
)
from pyjanitor_spark.sources.sinks import (  # noqa: F401
    read_bucketed_table,
    read_csv,
    read_orc,
    write_bucketed_table,
    write_csv,
    write_json,
    write_orc,
    write_parquet,
    write_zordered,
    zorder_key,
)
