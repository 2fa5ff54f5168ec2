from fmx.sources.tables import (  # noqa: F401
    TABLES,
    load_table,
    load_tables,
    read_csv,
    read_libsvm_text,
    register_views,
)
