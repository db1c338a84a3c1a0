from riskloc_spark.operators.riskloc import riskloc, riskloc_df

__all__ = ["riskloc", "riskloc_df"]
