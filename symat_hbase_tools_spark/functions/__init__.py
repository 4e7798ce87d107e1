from symat_hbase_tools_spark.functions.bytes_binary import (  # noqa: F401
    to_bytes_binary,
    to_string_binary,
    to_bytes_binary_col,
    to_string_binary_col,
)
