from quebic_spark.sources.io import (
    export_queue,
    import_into_queue,
    read_table,
)
from quebic_spark.sources.quebic_format import (
    OversizedFileError,
    export_quebic_queue,
    export_quebic_shards,
    import_oversized_queue,
    iter_quebic_fifo,
    migrate_quebic_queue,
    read_quebic_dir,
)

__all__ = [
    "export_queue",
    "import_into_queue",
    "read_table",
    "OversizedFileError",
    "export_quebic_queue",
    "export_quebic_shards",
    "import_oversized_queue",
    "iter_quebic_fifo",
    "migrate_quebic_queue",
    "read_quebic_dir",
]
