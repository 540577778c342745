"""External-system sinks (JDBC databases).

The engine's primary keyed sink is the LakeTable; these adapters cover
the reference's SQLLoader surface for users with a real RDBMS target
(reference:src/etl_framework/plugins/loaders/sql_loader.py).
"""

from etl_framework_spark.sinks.jdbc import (  # noqa: F401
    JdbcLoader,
    build_create_table_sql,
    build_merge_sql,
)
