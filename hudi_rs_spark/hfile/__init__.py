from hudi_rs_spark.hfile.reader import HFile

__all__ = ["HFile"]
