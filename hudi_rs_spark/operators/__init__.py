"""DataFrame -> DataFrame operators.

Everything here is expressed with built-in Spark SQL functions (JVM-side,
whole-stage-codegen eligible); Python UDFs appear only where semantics
genuinely require them, always Arrow-batched (pandas UDFs).
"""
