from jasminegraph_spark.cypher.compiler import cypher_create, cypher_query  # noqa: F401
from jasminegraph_spark.cypher.parser import parse  # noqa: F401
