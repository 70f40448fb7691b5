"""xhtmlkit_spark.functions"""
