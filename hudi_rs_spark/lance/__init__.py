from hudi_rs_spark.lance.reader import LanceFile  # noqa: F401
