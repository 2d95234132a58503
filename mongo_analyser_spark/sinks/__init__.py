from mongo_analyser_spark.sinks.export import (
    export_csv,
    export_json,
    export_json_array_gz,
    write_schema_json,
)

__all__ = [
    "export_json",
    "export_json_array_gz",
    "export_csv",
    "write_schema_json",
]
