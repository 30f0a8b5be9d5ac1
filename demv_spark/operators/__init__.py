from demv_spark.operators.balancer import DEMV, group_targets, rebalance

__all__ = ["DEMV", "group_targets", "rebalance"]
