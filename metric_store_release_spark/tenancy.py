"""Multi-tenant query authorization (reference: CF auth proxy).

The reference parses every query's AST and rejects it unless every selector
carries a strict `source_id="x"` equality whose value is authorized
(src/pkg/cfauthproxy/query_parsing.go:12-95,
src/pkg/auth/cf_auth_middleware.go:60-96). Same contract here, plus a
rewrite mode that *injects* the tenant filter instead of rejecting —
trivially safe because the matcher lands in the parquet scan's pushed
filters.
"""

from __future__ import annotations

from metric_store_release_spark.promql import ast, parse
from metric_store_release_spark.promql.ast import LabelMatcher, MatchOp, VectorSelector

SOURCE_ID_LABEL = "source_id"


class AuthorizationError(Exception):
    pass


def extract_source_ids(promql: str) -> set[str]:
    """All source_id equality values; raises if any selector lacks a strict
    equality matcher (query_parsing.go:42-70 visitor semantics)."""
    node = parse(promql)
    ids: set[str] = set()
    for n in ast.walk(node):
        if isinstance(n, VectorSelector):
            eq = [
                m.value
                for m in n.matchers
                if m.name == SOURCE_ID_LABEL and m.op == MatchOp.EQ
            ]
            if not eq:
                raise AuthorizationError(
                    "query selectors must each carry a source_id equality matcher"
                )
            ids.update(eq)
    return ids


def authorize(promql: str, allowed_source_ids: set[str], is_admin: bool = False) -> None:
    """cf_auth_middleware.go:60-96: admins pass; others need every selector
    source_id to be in their authorized set."""
    if is_admin:
        return
    for sid in extract_source_ids(promql):
        if sid not in allowed_source_ids:
            raise AuthorizationError(f"source_id {sid!r} not authorized")


def inject_source_id(promql: str, source_id: str) -> str:
    """Rewrite: add source_id="…" to every selector (tenancy by
    construction). Returns the rewritten query string."""
    node = parse(promql)
    for n in ast.walk(node):
        if isinstance(n, VectorSelector):
            n.matchers = [m for m in n.matchers if m.name != SOURCE_ID_LABEL] + [
                LabelMatcher(SOURCE_ID_LABEL, MatchOp.EQ, source_id)
            ]
    out = _format(node)
    # Defense in depth: re-parse the rewritten query and verify every
    # selector carries exactly the injected source_id equality. Catches any
    # formatter/escaping bug before the query string leaves this function.
    for n in ast.walk(parse(out)):
        if isinstance(n, VectorSelector):
            sids = [
                m.value
                for m in n.matchers
                if m.name == SOURCE_ID_LABEL and m.op == MatchOp.EQ
            ]
            if sids != [source_id]:
                raise AuthorizationError(
                    "source_id injection failed to round-trip; refusing query"
                )
    return out


def _escape(value: str) -> str:
    """Escape a label-matcher value for embedding in double quotes.

    Without this, a matcher value like ``x", source_id="victim`` would smuggle
    extra matchers (or close the selector early) when the AST is re-formatted
    — a tenant-isolation break in the rewrite path.
    """
    return (
        value.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")
    )


def _format(node: ast.Node) -> str:
    """Minimal PromQL pretty-printer (round-trips the supported grammar)."""
    if isinstance(node, ast.NumberLiteral):
        return repr(node.value)
    if isinstance(node, ast.StringLiteral):
        return '"' + node.value.replace("\\", "\\\\").replace('"', '\\"') + '"'
    if isinstance(node, VectorSelector):
        matchers = ", ".join(
            f'{m.name}{m.op.value}"{_escape(m.value)}"' for m in node.matchers
        )
        out = (node.name or "") + ("{" + matchers + "}" if matchers else "")
        if node.offset_ms:
            out += f" offset {node.offset_ms}ms"
        if node.at_ms is not None:
            out += f" @ {node.at_ms / 1000}"
        elif node.at_preprocessor:
            out += f" @ {node.at_preprocessor}()"
        return out
    if isinstance(node, ast.MatrixSelector):
        return f"{_format(node.selector)}[{node.range_ms}ms]"
    if isinstance(node, ast.SubqueryExpr):
        step = f"{node.step_ms}ms" if node.step_ms else ""
        out = f"{_format(node.expr)}[{node.range_ms}ms:{step}]"
        if node.offset_ms:
            out += f" offset {node.offset_ms}ms"
        return out
    if isinstance(node, ast.Call):
        return f"{node.func}({', '.join(_format(a) for a in node.args)})"
    if isinstance(node, ast.AggregateExpr):
        mod = ""
        if node.grouping:
            kw = "without" if node.without else "by"
            mod = f" {kw} ({', '.join(node.grouping)}) "
        args = [node.param, node.expr] if node.param is not None else [node.expr]
        return f"{node.op}{mod}({', '.join(_format(a) for a in args)})"
    if isinstance(node, ast.BinaryExpr):
        m = node.matching
        mods = []
        if node.return_bool:
            mods.append("bool")
        if m and m.matching_labels:
            mods.append(
                ("on" if m.on else "ignoring")
                + "("
                + ", ".join(m.matching_labels)
                + ")"
            )
        if m and m.card == ast.VectorMatchCard.MANY_TO_ONE:
            mods.append("group_left(" + ", ".join(m.include) + ")")
        elif m and m.card == ast.VectorMatchCard.ONE_TO_MANY:
            mods.append("group_right(" + ", ".join(m.include) + ")")
        mid = " ".join([node.op] + mods)
        return f"({_format(node.lhs)} {mid} {_format(node.rhs)})"
    if isinstance(node, ast.UnaryExpr):
        return f"{node.op}({_format(node.expr)})"
    if isinstance(node, ast.ParenExpr):
        return f"({_format(node.expr)})"
    raise TypeError(type(node).__name__)
