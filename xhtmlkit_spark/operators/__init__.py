"""xhtmlkit_spark.operators"""
