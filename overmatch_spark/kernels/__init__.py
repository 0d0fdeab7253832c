"""Pure-numpy kernels (no Spark imports). These back the executable
spec (overmatch_spark.spec) and the few Arrow UDFs the engine needs."""
