from pyjanitor_spark.sources.io import (  # noqa: F401
    read_commandline,
    read_csvs,
    read_table,
    xlsx_cells,
    xlsx_table,
)
