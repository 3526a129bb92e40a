"""PromQL front-end: lexer, recursive-descent parser, AST.

Grammar parity target: the vendored Prometheus parser
(/root/reference/vendor/github.com/prometheus/prometheus/promql/parser/),
re-expressed as a hand-written Python recursive-descent parser (the reference
uses a goyacc grammar — generated_parser.y).
"""

from metric_store_release_spark.promql.parser import parse
from metric_store_release_spark.promql import ast

__all__ = ["parse", "ast"]
