"""Sources: schema-pinned scans for the formats the reference ingests."""

from etl_framework_spark.sources.feather import (  # noqa: F401
    read_feather,
    write_feather,
)
from etl_framework_spark.sources.readers import (  # noqa: F401
    flatten_json,
    read_csv,
    read_excel,
    read_json,
    read_parquet,
    read_pdf_tables,
)
from etl_framework_spark.sources.xlsx import parse_xlsx, write_xlsx  # noqa: F401
