"""xhtmlkit_spark.plans"""
