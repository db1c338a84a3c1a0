from riskloc_spark.sources.readers import (  # noqa: F401
    read_rca_csv,
    read_rca_csv_derived,
    read_robustspot_csv,
)
