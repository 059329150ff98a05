from pyjanitor_spark.plans.inspect import (  # noqa: F401
    broadcast_join_count,
    codegen_stage_count,
    executed_plan,
    generate_fed_broadcasts,
    pushed_filters,
    read_schema,
    scale_report,
    scan_columns,
    shuffle_count,
)
