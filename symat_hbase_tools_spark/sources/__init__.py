from symat_hbase_tools_spark.sources.tables import (  # noqa: F401
    TABLE_NAMES,
    load_table,
    register_views,
)
from symat_hbase_tools_spark.sources.cells import (  # noqa: F401
    CELLS_SCHEMA,
    CELL_TS,
    encode_table_as_cells,
    customer_cells,
    customer_cells_versioned,
    cells_to_wide,
)
