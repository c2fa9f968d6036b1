from flink_rtcef_spark.operators.cep import BatchCEP

__all__ = ["BatchCEP"]
