"""xhtmlkit_spark.sources"""
