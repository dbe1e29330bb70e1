"""Sources & sinks: distributed DSV scan, JSON raw layer, partitioned
Parquet medallion layers, and (optional) JDBC.

Replaces the reference's pandas chunk-loop extract + psycopg2 sinks
(SURVEY.md §2.1 S1-S11) with declarative, distributed equivalents.
"""

from novi_pdq_etl_project_prod_spark.sources.dsv import read_dsv  # noqa: F401
from novi_pdq_etl_project_prod_spark.sources.layers import (  # noqa: F401
    MedallionLayer,
    read_month,
    resolve_table_path,
    write_month_idempotent,
)
from novi_pdq_etl_project_prod_spark.sources.json_raw import (  # noqa: F401
    encode_raw_json,
    parse_raw_json,
)
