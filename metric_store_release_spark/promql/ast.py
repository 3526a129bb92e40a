"""PromQL AST node definitions.

Parity with the vendored parser's AST (vendor/.../promql/parser/ast.go):
VectorSelector, MatrixSelector, SubqueryExpr, Call, AggregateExpr,
BinaryExpr(+VectorMatching), UnaryExpr, NumberLiteral, StringLiteral,
StepInvariantExpr is handled implicitly (steps are a column, so constant
subtrees evaluate once for free).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class MatchOp(Enum):
    EQ = "="
    NEQ = "!="
    RE = "=~"
    NRE = "!~"


@dataclass(frozen=True)
class LabelMatcher:
    name: str
    op: MatchOp
    value: str


@dataclass
class Node:
    pass


@dataclass
class NumberLiteral(Node):
    value: float


@dataclass
class StringLiteral(Node):
    value: str


@dataclass
class VectorSelector(Node):
    name: str | None
    matchers: list[LabelMatcher] = field(default_factory=list)
    offset_ms: int = 0
    at_ms: int | None = None  # @ modifier (vendor promql/parser/ast.go:198)
    at_preprocessor: str | None = None  # "start" | "end"


@dataclass
class MatrixSelector(Node):
    selector: VectorSelector
    range_ms: int


@dataclass
class SubqueryExpr(Node):
    expr: Node
    range_ms: int
    step_ms: int | None  # None → default resolution
    offset_ms: int = 0
    at_ms: int | None = None
    at_preprocessor: str | None = None


@dataclass
class Call(Node):
    func: str
    args: list[Node]


# aggregation ops — vendor promql/parser/lex.go keyword set
AGGREGATORS = {
    "sum",
    "avg",
    "min",
    "max",
    "count",
    "group",
    "stddev",
    "stdvar",
    "topk",
    "bottomk",
    "quantile",
    "count_values",
}

# aggregators whose first argument is a parameter (vendor parser/parse.go:356)
PARAM_AGGREGATORS = {"topk", "bottomk", "quantile", "count_values"}


@dataclass
class AggregateExpr(Node):
    op: str
    expr: Node
    param: Node | None = None
    grouping: list[str] = field(default_factory=list)
    without: bool = False


class VectorMatchCard(Enum):
    ONE_TO_ONE = "one-to-one"
    MANY_TO_ONE = "many-to-one"
    ONE_TO_MANY = "one-to-many"
    MANY_TO_MANY = "many-to-many"  # set operators


@dataclass
class VectorMatching:
    """vendor promql/parser/ast.go:280-292."""

    card: VectorMatchCard = VectorMatchCard.ONE_TO_ONE
    matching_labels: list[str] = field(default_factory=list)
    on: bool = False
    include: list[str] = field(default_factory=list)


ARITH_OPS = {"+", "-", "*", "/", "%", "^", "atan2"}
COMPARE_OPS = {"==", "!=", ">", "<", ">=", "<="}
SET_OPS = {"and", "or", "unless"}


@dataclass
class BinaryExpr(Node):
    op: str
    lhs: Node
    rhs: Node
    matching: VectorMatching | None = None
    return_bool: bool = False


@dataclass
class UnaryExpr(Node):
    op: str  # '+' or '-'
    expr: Node


@dataclass
class ParenExpr(Node):
    expr: Node


def walk(node: Node):
    """Yield every node in the tree (pre-order)."""
    yield node
    children: list[Node] = []
    if isinstance(node, MatrixSelector):
        children = [node.selector]
    elif isinstance(node, SubqueryExpr):
        children = [node.expr]
    elif isinstance(node, Call):
        children = node.args
    elif isinstance(node, AggregateExpr):
        children = [node.expr] + ([node.param] if node.param else [])
    elif isinstance(node, BinaryExpr):
        children = [node.lhs, node.rhs]
    elif isinstance(node, (UnaryExpr, ParenExpr)):
        children = [node.expr]
    for c in children:
        yield from walk(c)
