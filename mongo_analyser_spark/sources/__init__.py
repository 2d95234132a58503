"""Sources & sinks: parquet tables (driver testdata), MongoDB connector
options (live mode), export sinks — SURVEY.md §2.1."""
