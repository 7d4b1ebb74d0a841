from bluegraph_spark.functions.mi import mutual_information_col

__all__ = ["mutual_information_col"]
