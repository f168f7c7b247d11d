from stonedb_spark.functions.exact import dsum, davg, dmul
