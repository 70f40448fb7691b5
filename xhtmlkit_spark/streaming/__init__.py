"""xhtmlkit_spark.streaming"""
