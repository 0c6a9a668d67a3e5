# Operator library: pure DataFrame -> DataFrame functions, composable
# into pipelines. Import submodules directly, e.g.
#   from e_commerce_lakehouse_spark.operators import aggregates, joins
