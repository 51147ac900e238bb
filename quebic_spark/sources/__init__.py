from quebic_spark.sources.io import (
    export_queue,
    import_into_queue,
    read_table,
)

__all__ = ["export_queue", "import_into_queue", "read_table"]
