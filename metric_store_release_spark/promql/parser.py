"""PromQL recursive-descent parser.

Same grammar as the vendored goyacc parser
(vendor/.../promql/parser/generated_parser.y); precedence ladder per
lex.go / Prometheus docs:

    or  <  and, unless  <  comparisons  <  +, -  <  *, /, %, atan2  <  ^
    (left-assoc except ^ which is right-assoc), then unary, then postfix
    ([range], [range:step] subquery, offset, @).
"""

from __future__ import annotations

from metric_store_release_spark.promql import ast
from metric_store_release_spark.promql.ast import (
    AggregateExpr,
    BinaryExpr,
    Call,
    LabelMatcher,
    MatchOp,
    MatrixSelector,
    NumberLiteral,
    ParenExpr,
    StringLiteral,
    SubqueryExpr,
    UnaryExpr,
    VectorMatchCard,
    VectorMatching,
    VectorSelector,
)
from metric_store_release_spark.promql.lexer import (
    PromQLSyntaxError,
    Token,
    parse_duration_ms,
    tokenize,
)

_PRECEDENCE = [
    {"or"},
    {"and", "unless"},
    {"==", "!=", "<=", ">=", "<", ">"},
    {"+", "-"},
    {"*", "/", "%", "atan2"},
    {"^"},
]


def parse(src: str) -> ast.Node:
    p = _Parser(tokenize(src))
    expr = p.parse_expr()
    p.expect_kind("EOF")
    return expr


class _Parser:
    def __init__(self, toks: list[Token]):
        self.toks = toks
        self.i = 0

    # ---- token helpers -------------------------------------------------
    def peek(self) -> Token:
        return self.toks[self.i]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    @staticmethod
    def _describe(t: Token) -> str:
        return "end of input" if t.kind == "EOF" else repr(t.text)

    def at_op(self, *texts: str) -> bool:
        t = self.peek()
        return (t.kind == "OP" or t.kind == "IDENT") and t.text in texts

    def accept_op(self, *texts: str) -> Token | None:
        if self.at_op(*texts):
            return self.next()
        return None

    def expect_op(self, text: str) -> Token:
        t = self.next()
        if t.text != text:
            raise PromQLSyntaxError(
                f"expected {text!r}, got {self._describe(t)} at {t.pos}"
            )
        return t

    def expect_kind(self, kind: str) -> Token:
        t = self.next()
        if t.kind != kind:
            raise PromQLSyntaxError(
                f"expected {kind}, got {self._describe(t)} at {t.pos}"
            )
        return t

    # ---- expressions ---------------------------------------------------
    def parse_expr(self, level: int = 0) -> ast.Node:
        if level == len(_PRECEDENCE):
            return self.parse_unary()
        ops = _PRECEDENCE[level]
        right_assoc = "^" in ops
        lhs = self.parse_expr(level + 1)
        while self.at_op(*ops):
            op = self.next().text
            return_bool = bool(self.accept_op("bool"))
            matching = self.parse_vector_matching(op)
            rhs = self.parse_expr(level if right_assoc else level + 1)
            lhs = BinaryExpr(op, lhs, rhs, matching=matching, return_bool=return_bool)
            if return_bool and op not in ast.COMPARE_OPS:
                raise PromQLSyntaxError("bool modifier only on comparison operators")
        return lhs

    def parse_vector_matching(self, op: str) -> VectorMatching | None:
        matching = None
        if self.at_op("on", "ignoring"):
            kw = self.next().text
            matching = VectorMatching(on=(kw == "on"), matching_labels=self.label_list())
        if self.at_op("group_left", "group_right"):
            kw = self.next().text
            if matching is None:
                matching = VectorMatching()
            matching.card = (
                VectorMatchCard.MANY_TO_ONE
                if kw == "group_left"
                else VectorMatchCard.ONE_TO_MANY
            )
            if self.at_op("("):
                matching.include = self.label_list()
            if op in ast.SET_OPS:
                raise PromQLSyntaxError("no grouping allowed for set operators")
        if matching is None and op in ast.SET_OPS:
            matching = VectorMatching(card=VectorMatchCard.MANY_TO_MANY)
        return matching

    def label_list(self) -> list[str]:
        self.expect_op("(")
        out: list[str] = []
        while not self.at_op(")"):
            t = self.next()
            if t.kind != "IDENT":
                raise PromQLSyntaxError(f"expected label name at {t.pos}")
            out.append(t.text)
            if not self.accept_op(","):
                break
        self.expect_op(")")
        return out

    def parse_unary(self) -> ast.Node:
        if self.at_op("+", "-"):
            op = self.next().text
            # Reference grammar binds unary at multiplicative precedence
            # (generated_parser.y: `unary_op expr %prec MUL`), LOOSER than ^:
            # parse the operand at the ^ level so -2^2 == -(2^2) == -4,
            # while -a*b still groups as (-a)*b.
            expr = self.parse_expr(len(_PRECEDENCE) - 1)
            # constant-fold the common "-5" case like the reference parser
            if isinstance(expr, NumberLiteral):
                return NumberLiteral(-expr.value if op == "-" else expr.value)
            return UnaryExpr(op, expr)
        return self.parse_postfix()

    def parse_postfix(self) -> ast.Node:
        node = self.parse_primary()
        while True:
            if self.at_op("["):
                node = self.parse_range_or_subquery(node)
            elif self.at_op("offset"):
                self.next()
                neg = bool(self.accept_op("-"))
                dur = parse_duration_ms(self.expect_kind("DURATION").text)
                self._set_offset(node, -dur if neg else dur)
            elif self.at_op("@"):
                self.next()
                self._set_at(node)
            else:
                return node

    def parse_range_or_subquery(self, node: ast.Node) -> ast.Node:
        self.expect_op("[")
        range_ms = parse_duration_ms(self.expect_kind("DURATION").text)
        if self.accept_op(":"):
            step_ms = None
            if self.peek().kind == "DURATION":
                step_ms = parse_duration_ms(self.next().text)
            self.expect_op("]")
            return SubqueryExpr(self._unparen(node), range_ms, step_ms)
        self.expect_op("]")
        if not isinstance(node, VectorSelector):
            raise PromQLSyntaxError("range selector only allowed on a vector selector")
        return MatrixSelector(node, range_ms)

    @staticmethod
    def _unparen(node: ast.Node) -> ast.Node:
        return node.expr if isinstance(node, ParenExpr) else node

    def _set_offset(self, node: ast.Node, ms: int) -> None:
        if isinstance(node, VectorSelector):
            node.offset_ms = ms
        elif isinstance(node, MatrixSelector):
            node.selector.offset_ms = ms
        elif isinstance(node, SubqueryExpr):
            node.offset_ms = ms
        else:
            raise PromQLSyntaxError("offset only allowed on selectors/subqueries")

    def _set_at(self, node: ast.Node) -> None:
        t = self.peek()
        if t.kind == "NUMBER":
            at_ms = int(float(self.next().text) * 1000)
            prep = None
        elif t.kind == "IDENT" and t.text in ("start", "end"):
            prep = self.next().text
            self.expect_op("(")
            self.expect_op(")")
            at_ms = None
        else:
            raise PromQLSyntaxError(f"bad @ modifier at {t.pos}")
        if isinstance(node, VectorSelector):
            node.at_ms, node.at_preprocessor = at_ms, prep
        elif isinstance(node, MatrixSelector):
            node.selector.at_ms, node.selector.at_preprocessor = at_ms, prep
        elif isinstance(node, SubqueryExpr):
            node.at_ms, node.at_preprocessor = at_ms, prep
        else:
            raise PromQLSyntaxError("@ only allowed on selectors/subqueries")

    def parse_primary(self) -> ast.Node:
        t = self.peek()
        if t.kind == "NUMBER":
            self.next()
            return NumberLiteral(_parse_number(t.text))
        if t.kind == "STRING":
            self.next()
            return StringLiteral(t.text)
        if t.kind == "OP" and t.text == "(":
            self.next()
            inner = self.parse_expr()
            self.expect_op(")")
            return ParenExpr(inner)
        if t.kind == "OP" and t.text == "{":
            return self.parse_vector_selector(None)
        if t.kind == "IDENT":
            low = t.text.lower()
            if low in ("inf", "nan") or low.startswith(("0x",)):
                self.next()
                return NumberLiteral(_parse_number(t.text))
            if t.text in ast.AGGREGATORS:
                return self.parse_aggregation()
            nxt = self.toks[self.i + 1]
            if nxt.kind == "OP" and nxt.text == "(":
                return self.parse_call()
            self.next()
            return self.parse_vector_selector(t.text)
        raise PromQLSyntaxError(f"unexpected {self._describe(t)} at {t.pos}")

    def parse_vector_selector(self, name: str | None) -> VectorSelector:
        matchers: list[LabelMatcher] = []
        if self.at_op("{"):
            self.next()
            while not self.at_op("}"):
                lt = self.next()
                if lt.kind != "IDENT":
                    raise PromQLSyntaxError(f"expected label name at {lt.pos}")
                opt = self.next()
                try:
                    mop = MatchOp(opt.text)
                except ValueError:
                    raise PromQLSyntaxError(f"bad matcher op {opt.text!r} at {opt.pos}")
                vt = self.expect_kind("STRING")
                matchers.append(LabelMatcher(lt.text, mop, vt.text))
                if not self.accept_op(","):
                    break
            self.expect_op("}")
        if name is None and not matchers:
            raise PromQLSyntaxError("vector selector must have a name or matchers")
        return VectorSelector(name, matchers)

    def parse_call(self) -> Call:
        name = self.next().text
        self.expect_op("(")
        args: list[ast.Node] = []
        while not self.at_op(")"):
            args.append(self.parse_expr())
            if not self.accept_op(","):
                break
        self.expect_op(")")
        return Call(name, args)

    def parse_aggregation(self) -> AggregateExpr:
        op = self.next().text
        grouping: list[str] = []
        without = False
        if self.at_op("by", "without"):
            without = self.next().text == "without"
            grouping = self.label_list()
        self.expect_op("(")
        args: list[ast.Node] = []
        while not self.at_op(")"):
            args.append(self.parse_expr())
            if not self.accept_op(","):
                break
        self.expect_op(")")
        if not grouping and self.at_op("by", "without"):
            without = self.next().text == "without"
            grouping = self.label_list()
        param = None
        if op in ast.PARAM_AGGREGATORS:
            if len(args) != 2:
                raise PromQLSyntaxError(f"{op} expects (param, vector)")
            param, expr = args
        else:
            if len(args) != 1:
                raise PromQLSyntaxError(f"{op} expects a single vector argument")
            expr = args[0]
        return AggregateExpr(op, expr, param=param, grouping=grouping, without=without)


def _parse_number(text: str) -> float:
    low = text.lower()
    if low in ("inf", "+inf"):
        return float("inf")
    if low == "-inf":
        return float("-inf")
    if low == "nan":
        return float("nan")
    if low.startswith("0x"):
        return float(int(text, 16))
    return float(text)
