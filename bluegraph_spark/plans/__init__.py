from bluegraph_spark.plans.checkpoint import SuperstepCheckpointer

__all__ = ["SuperstepCheckpointer"]
