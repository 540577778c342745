"""Config-driven column transforms (the reference's transformer surface)."""

from etl_framework_spark.transforms.calc_compiler import (  # noqa: F401
    MappingProgram,
    compile_calculations,
)
from etl_framework_spark.transforms.cleaner import (  # noqa: F401
    drop_empty_rows,
    fill_missing,
    rename_columns,
    standardize_column_names,
)
from etl_framework_spark.transforms.enricher import (  # noqa: F401
    EnricherTransformer,
)
from etl_framework_spark.transforms.crypto import (  # noqa: F401
    decrypt_columns,
    detect_sensitive_columns,
    encrypt_columns,
    mask_column,
    sanitize_strings,
)
