from token_etl_spark.plans.registry import QUERIES, ORACLES, QuerySpec

__all__ = ["QUERIES", "ORACLES", "QuerySpec"]
