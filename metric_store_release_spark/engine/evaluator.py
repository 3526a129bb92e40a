"""AST → DataFrame compiler (the query planner).

The reference's evaluator walks the AST once per timestep
(vendor promql/engine.go:1112-1311 rangeEval). Here the AST is walked ONCE,
emitting a declarative DataFrame program with the step grid as a column —
Catalyst then owns physical planning (pushdown, partial aggregation, join
strategy, AQE). Step-invariant subexpressions (the reference's
StepInvariantExpr rewrite, engine.go:2924+) come for free: a literal is a
literal column, evaluated once.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from metric_store_release_spark.datamodel import (
    NAME_LABEL,
    labels_keep,
    labels_without,
    sig,
    sig_of,
)
from metric_store_release_spark.engine import selectors
from metric_store_release_spark.engine.histogram import histogram_quantile
from metric_store_release_spark.engine.range_functions import (
    BUCKETED_FUNCS,
    NEEDS_ORDER_COLS,
    RANGE_FUNCS,
    apply_range_func,
)
from metric_store_release_spark.engine.results import (
    RangeFrame,
    ScalarResult,
    StringResult,
    VectorResult,
)
from metric_store_release_spark.engine import scalar_functions as sf
from metric_store_release_spark.promql import ast
from metric_store_release_spark.promql.ast import (
    AggregateExpr,
    BinaryExpr,
    Call,
    MatchOp,
    MatrixSelector,
    NumberLiteral,
    ParenExpr,
    StringLiteral,
    SubqueryExpr,
    UnaryExpr,
    VectorMatchCard,
    VectorSelector,
)


class PromQLEvalError(Exception):
    pass


@dataclass
class EvalContext:
    spark: SparkSession
    samples: DataFrame
    start_ms: int
    end_ms: int
    step_ms: int
    lookback_ms: int
    default_subquery_step_ms: int = 60_000
    query_start_ms: int = 0  # for @ start()/end()
    query_end_ms: int = 0
    check_matching: bool = True  # runtime duplicate/many-to-many assertions
    #: use tumbling-partial (two-level) evaluation for combinable range
    #: functions when range/step >= this ratio (0 = disabled, the default:
    #: map-side combine already compresses the direct fan-out pre-shuffle)
    bucketed_range_threshold: int = 0

    @property
    def n_steps(self) -> int:
        return (self.end_ms - self.start_ms) // self.step_ms + 1


class Evaluator:
    def __init__(self, ctx: EvalContext):
        self.ctx = ctx
        # memoize selector DataFrames: repeated subexpressions (e.g. the two
        # sides of a / sum(a) ratio) share one plan subtree, letting Spark's
        # ReuseExchange serve both from a single shuffle
        self._selector_cache: dict = {}

    # ------------------------------------------------------------------ util
    def steps_df(self) -> DataFrame:
        c = self.ctx
        return self.ctx.spark.range(c.n_steps).select(
            (F.lit(c.start_ms) + F.col("id") * F.lit(c.step_ms))
            .cast("long")
            .alias("t")
        )

    def _resolve_at(self, node: VectorSelector | SubqueryExpr) -> None:
        if node.at_preprocessor == "start":
            node.at_ms = self.ctx.query_start_ms
        elif node.at_preprocessor == "end":
            node.at_ms = self.ctx.query_end_ms

    # ------------------------------------------------------------------ eval
    def eval(self, node: ast.Node):
        if isinstance(node, ParenExpr):
            return self.eval(node.expr)
        if isinstance(node, NumberLiteral):
            return ScalarResult(const=node.value)
        if isinstance(node, StringLiteral):
            return StringResult(node.value)
        if isinstance(node, VectorSelector):
            return self.eval_selector(node)
        if isinstance(node, (MatrixSelector, SubqueryExpr)):
            raise PromQLEvalError(
                "range vector expression must be wrapped in a range function"
            )
        if isinstance(node, Call):
            return self.eval_call(node)
        if isinstance(node, AggregateExpr):
            return self.eval_aggregation(node)
        if isinstance(node, BinaryExpr):
            return self.eval_binary(node)
        if isinstance(node, UnaryExpr):
            return self.eval_unary(node)
        raise PromQLEvalError(f"unsupported node {type(node).__name__}")

    # ------------------------------------------------------------- selectors
    def eval_selector(self, node: VectorSelector) -> VectorResult:
        self._resolve_at(node)
        c = self.ctx
        key = (node.name, tuple(node.matchers), node.offset_ms, node.at_ms)
        if key not in self._selector_cache:
            self._selector_cache[key] = selectors.instant_vector(
                c.samples, node, c.start_ms, c.end_ms, c.step_ms, c.lookback_ms
            )
        return VectorResult(self._selector_cache[key])

    def build_range_frame(
        self, node: ast.Node, order_cols: bool, func: str | None = None
    ) -> RangeFrame:
        """Materialize a range vector (matrix selector or subquery)."""
        c = self.ctx
        if isinstance(node, ParenExpr):
            return self.build_range_frame(node.expr, order_cols, func)
        if isinstance(node, MatrixSelector):
            self._resolve_at(node.selector)
            if self._use_bucketed(node, func):
                df = selectors.bucketed_range_frame(
                    c.samples,
                    node.selector,
                    node.range_ms,
                    c.start_ms,
                    c.end_ms,
                    c.step_ms,
                    order_cols=order_cols,
                )
                return RangeFrame(
                    df,
                    node.range_ms,
                    node.selector.offset_ms,
                    order_cols,
                    at_ms=None,
                    bucketed=True,
                )
            df = selectors.range_frame(
                c.samples,
                node.selector,
                node.range_ms,
                c.start_ms,
                c.end_ms,
                c.step_ms,
                order_cols=order_cols,
            )
            return RangeFrame(
                df,
                node.range_ms,
                node.selector.offset_ms,
                order_cols,
                at_ms=node.selector.at_ms,
            )
        if isinstance(node, SubqueryExpr):
            return self.eval_subquery_frame(node, order_cols)
        raise PromQLEvalError("expected a range vector argument")

    def _use_bucketed(self, node: MatrixSelector, func: str | None) -> bool:
        thr = self.ctx.bucketed_range_threshold
        return (
            thr > 0
            and func in BUCKETED_FUNCS
            and node.selector.at_ms is None
            and node.range_ms % self.ctx.step_ms == 0
            and node.range_ms // self.ctx.step_ms >= thr
        )

    def eval_subquery_frame(self, node: SubqueryExpr, order_cols: bool) -> RangeFrame:
        """engine.go:1730-1768 — inner grid aligned to absolute multiples of
        the inner interval, then windowed like a matrix selector."""
        self._resolve_at(node)
        c = self.ctx
        interval = node.step_ms or c.default_subquery_step_ms
        if node.at_ms is not None:
            outer_start = outer_end = node.at_ms
        else:
            outer_start, outer_end = c.start_ms, c.end_ms
        inner_start = interval * ((outer_start - node.offset_ms - node.range_ms) // interval)
        if inner_start < outer_start - node.offset_ms - node.range_ms:
            inner_start += interval
        inner_end_raw = outer_end - node.offset_ms
        inner_end = inner_start + ((inner_end_raw - inner_start) // interval) * interval
        inner_ctx = EvalContext(
            spark=c.spark,
            samples=c.samples,
            start_ms=inner_start,
            end_ms=inner_end,
            step_ms=interval,
            lookback_ms=c.lookback_ms,
            default_subquery_step_ms=c.default_subquery_step_ms,
            query_start_ms=c.query_start_ms,
            query_end_ms=c.query_end_ms,
        )
        inner = Evaluator(inner_ctx).eval(node.expr)
        if isinstance(inner, ScalarResult):
            inner = VectorResult(self._scalar_to_vector(inner, inner_ctx))
        if not isinstance(inner, VectorResult):
            raise PromQLEvalError("subquery inner expression must be a vector/scalar")
        pts = inner.df.select(
            F.col("t").alias("ts"), "sig", "labels", "value"
        )
        if order_cols:
            w = Window.partitionBy("sig").orderBy("ts")
            pts = (
                pts.withColumn("prev_value", F.lag("value").over(w))
                .withColumn("prev_ts", F.lag("ts").over(w))
                .withColumn(
                    "drop",
                    F.when(
                        F.col("value") < F.col("prev_value"), F.col("prev_value")
                    ).otherwise(F.lit(0.0)),
                )
                .withColumn(
                    "change",
                    F.when(F.col("prev_value").isNull(), F.lit(0))
                    .when(
                        (F.col("value") != F.col("prev_value"))
                        & ~(F.isnan("value") & F.isnan("prev_value")),
                        F.lit(1),
                    )
                    .otherwise(F.lit(0)),
                )
                .withColumn(
                    "reset",
                    F.when(F.col("value") < F.col("prev_value"), F.lit(1)).otherwise(
                        F.lit(0)
                    ),
                )
            )
        off = node.offset_ms
        if node.at_ms is not None:
            n_steps = (c.end_ms - c.start_ms) // c.step_ms
            exploded = (
                pts.withColumn("__k", F.explode(F.sequence(F.lit(0), F.lit(n_steps))))
                .withColumn(
                    "t",
                    (F.lit(c.start_ms) + F.col("__k") * F.lit(c.step_ms)).cast("long"),
                )
                .drop("__k")
            )
        else:
            exploded = selectors._explode_to_steps(
                pts,
                c.start_ms,
                c.end_ms,
                c.step_ms,
                F.col("ts") + F.lit(off),
                F.col("ts") + F.lit(off + node.range_ms),
            )
        return RangeFrame(exploded, node.range_ms, off, order_cols, at_ms=node.at_ms)

    # ----------------------------------------------------------------- calls
    def eval_call(self, node: Call):
        name = node.func
        if name in RANGE_FUNCS:
            return self._eval_range_call(node)
        if name == "histogram_quantile":
            q = self._const_scalar(node.args[0], "histogram_quantile quantile")
            vec = self._vector_arg(node.args[1])
            return VectorResult(self._check_unique(histogram_quantile(vec.df, q)))
        if name == "time":
            return ScalarResult(
                df=self.steps_df().select(
                    "t", (F.col("t") / 1000.0).alias("value")
                )
            )
        if name == "pi":
            return ScalarResult(const=math.pi)
        if name == "scalar":
            vec = self._vector_arg(node.args[0])
            per_t = vec.df.groupBy("t").agg(
                F.count(F.lit(1)).alias("n"), F.first("value").alias("v")
            )
            out = (
                self.steps_df()
                .join(per_t, "t", "left")
                .select(
                    "t",
                    F.when(F.col("n") == 1, F.col("v"))
                    .otherwise(F.lit(float("nan")))
                    .alias("value"),
                )
            )
            return ScalarResult(df=out)
        if name == "vector":
            s = self.eval(node.args[0])
            if not isinstance(s, ScalarResult):
                raise PromQLEvalError("vector() expects a scalar")
            return VectorResult(self._scalar_to_vector(s, self.ctx))
        if name == "timestamp":
            vec = self._vector_arg(node.args[0])
            df = vec.df
            src = (
                F.col("sample_ts") if "sample_ts" in df.columns else F.col("t")
            )
            # the output is a COMPUTED vector: its samples exist at eval
            # time, so sample_ts must not leak (timestamp(timestamp(v @ 10))
            # is the eval step, not 10 — at_modifier.test)
            out = self._drop_name(
                df.withColumn("value", src.cast("double") / 1000.0)
            )
            if "sample_ts" in df.columns:
                out = out.drop("sample_ts")
            return VectorResult(out)
        if name in ("sort", "sort_desc"):
            vec = self._vector_arg(node.args[0])
            # functions.go:349-364: both sorts put NaN LAST. Spark orders
            # NaN above every double (asc → last ✓, desc → first ✗), so
            # desc needs an explicit NaN-last key.
            order = (
                [F.col("value").asc()]
                if name == "sort"
                else [F.isnan("value").asc(), F.col("value").desc()]
            )
            return VectorResult(vec.df.orderBy(*order), order_by=order)
        if name == "absent":
            return self._eval_absent(node.args[0])
        if name == "absent_over_time":
            return self._eval_absent_over_time(node.args[0])
        if name == "label_replace":
            return self._eval_label_replace(node)
        if name == "label_join":
            return self._eval_label_join(node)
        if name in ("clamp", "clamp_max", "clamp_min"):
            return self._eval_clamp(node)
        if name == "round":
            vec = self._vector_arg(node.args[0])
            nearest = (
                self._const_scalar(node.args[1], "round to_nearest")
                if len(node.args) > 1
                else 1.0
            )
            return VectorResult(
                self._drop_name(
                    vec.df.withColumn("value", sf.promql_round(F.col("value"), nearest))
                )
            )
        if name in sf.DATE_FUNCS:
            if node.args:
                vec = self._vector_arg(node.args[0])
            else:
                vec = VectorResult(
                    self._scalar_to_vector(
                        ScalarResult(
                            df=self.steps_df().select(
                                "t", (F.col("t") / 1000.0).alias("value")
                            )
                        ),
                        self.ctx,
                    )
                )
            return VectorResult(
                self._drop_name(
                    vec.df.withColumn("value", sf.date_part(name, F.col("value")))
                )
            )
        if name in sf.SIMPLE_MATH:
            arg = self.eval(node.args[0])
            if isinstance(arg, ScalarResult):
                # functions like abs() are vector-only in PromQL, but keep
                # scalar math working for ln(2) style constants
                if arg.is_const:
                    return ScalarResult(const=_py_simple_math(name, arg.const))
                return ScalarResult(
                    df=arg.df.withColumn(
                        "value", sf.apply_simple_math(name, F.col("value"))
                    )
                )
            return VectorResult(
                self._drop_name(
                    arg.df.withColumn(
                        "value", sf.apply_simple_math(name, F.col("value"))
                    )
                )
            )
        raise PromQLEvalError(f"unsupported function {name!r}")

    def _eval_range_call(self, node: Call):
        name = node.func
        # range-vector argument position: last for quantile/holt_winters-style
        if name == "quantile_over_time":
            params = [self._const_scalar(node.args[0], "quantile φ")]
            range_arg = node.args[1]
        elif name == "holt_winters":
            params = [
                self._const_scalar(node.args[1], "sf"),
                self._const_scalar(node.args[2], "tf"),
            ]
            range_arg = node.args[0]
        elif name == "predict_linear":
            params = [self._const_scalar(node.args[1], "t")]
            range_arg = node.args[0]
        else:
            params = []
            range_arg = node.args[0]
        frame = self.build_range_frame(range_arg, name in NEEDS_ORDER_COLS, func=name)
        out = apply_range_func(name, frame, params)
        if name != "last_over_time":  # keeps __name__ — cannot collide
            out = self._check_unique(out)
        return VectorResult(out)

    def _eval_absent(self, arg: ast.Node) -> VectorResult:
        vec = self._vector_arg(arg)
        present = vec.df.select("t").distinct()
        missing = self.steps_df().join(present, "t", "left_anti")
        labels = self._absent_labels(arg)
        out = missing.select(
            "t",
            labels.alias("labels"),
            sig(labels).alias("sig"),
            F.lit(1.0).alias("value"),
        )
        return VectorResult(out)

    def _eval_absent_over_time(self, arg: ast.Node) -> VectorResult:
        frame = self.build_range_frame(arg, False)
        present = frame.df.select("t").distinct()
        missing = self.steps_df().join(present, "t", "left_anti")
        inner = arg
        while isinstance(inner, ParenExpr):
            inner = inner.expr
        sel = inner.selector if isinstance(inner, MatrixSelector) else None
        labels = self._absent_labels(sel) if sel else F.create_map()
        out = missing.select(
            "t",
            labels.alias("labels"),
            sig(labels).alias("sig"),
            F.lit(1.0).alias("value"),
        )
        return VectorResult(out)

    @staticmethod
    def _absent_labels(arg) -> Column:
        """functions.go createLabelsForAbsentFunction: a non-empty equality
        matcher sets its label (first occurrence wins); ANY other matcher —
        regex, !=, empty-value EQ, or a REPEATED EQ on the same name — marks
        the name for deletion at the end, so conflicting matchers like
        {job="a", job=~"b"} contribute nothing (functions.test)."""
        node = arg
        while isinstance(node, ParenExpr):
            node = node.expr
        b: dict[str, str] = {}
        dels: list[str] = []
        if isinstance(node, VectorSelector):
            for m in node.matchers:
                if m.name == NAME_LABEL:
                    continue
                if m.op == MatchOp.EQ and m.value != "" and not b.get(m.name):
                    b[m.name] = m.value
                else:
                    dels.append(m.name)
            for name in dels:
                b.pop(name, None)
        entries = [x for k, v in b.items() for x in (F.lit(k), F.lit(v))]
        return F.create_map(*entries) if entries else F.expr(
            "cast(map() as map<string,string>)"
        )

    def _eval_label_replace(self, node: Call) -> VectorResult:
        import re as _re

        vec = self._vector_arg(node.args[0])
        dst = self._const_string(node.args[1])
        repl = self._const_string(node.args[2])
        src = self._const_string(node.args[3])
        regex = self._const_string(node.args[4])
        # functions.go:1215-1245: invalid regex / destination name are errors
        try:
            _re.compile(regex)
        except _re.error as e:
            raise PromQLEvalError(f"invalid regular expression in label_replace(): {e}")
        if not _re.fullmatch(r"[a-zA-Z_][a-zA-Z0-9_]*", dst):
            raise PromQLEvalError(
                f"invalid destination label name in label_replace(): {dst!r}"
            )
        anchored = f"^(?:{regex})$"
        src_val = F.coalesce(F.col("labels").getItem(src), F.lit(""))
        matched = src_val.rlike(anchored)
        expansion = F.regexp_replace(src_val, anchored, repl)
        without_dst = F.map_filter(F.col("labels"), lambda k, _: k != F.lit(dst))
        new_labels = (
            F.when(
                matched & (expansion != ""),
                F.map_concat(without_dst, F.create_map(F.lit(dst), expansion)),
            )
            .when(matched, without_dst)
            .otherwise(F.col("labels"))
        )
        out = vec.df.withColumn("labels", new_labels).withColumn(
            "sig", sig(F.col("labels"))
        )
        return VectorResult(self._check_unique(out))

    def _eval_label_join(self, node: Call) -> VectorResult:
        import re as _re

        vec = self._vector_arg(node.args[0])
        dst = self._const_string(node.args[1])
        sep = self._const_string(node.args[2])
        if not _re.fullmatch(r"[a-zA-Z_][a-zA-Z0-9_]*", dst):
            raise PromQLEvalError(
                f"invalid destination label name in label_join(): {dst!r}"
            )
        srcs = [self._const_string(a) for a in node.args[3:]]
        joined = F.concat_ws(
            sep, *[F.coalesce(F.col("labels").getItem(s), F.lit("")) for s in srcs]
        )
        without_dst = F.map_filter(F.col("labels"), lambda k, _: k != F.lit(dst))
        new_labels = F.when(
            joined != "", F.map_concat(without_dst, F.create_map(F.lit(dst), joined))
        ).otherwise(without_dst)
        out = vec.df.withColumn("labels", new_labels).withColumn(
            "sig", sig(F.col("labels"))
        )
        return VectorResult(self._check_unique(out))

    def _eval_clamp(self, node: Call) -> VectorResult:
        vec = self._vector_arg(node.args[0])
        if node.func == "clamp":
            mn_v = self._const_scalar(node.args[1], "min")
            mx_v = self._const_scalar(node.args[2], "max")
            # funcClamp: max < min → empty vector (NOT NaN; false when
            # either bound is NaN, which instead propagates per-value)
            if mx_v < mn_v:
                return VectorResult(vec.df.filter(F.lit(False)))
            mn, mx = F.lit(mn_v), F.lit(mx_v)
        elif node.func == "clamp_max":
            mn = F.lit(float("-inf"))
            mx = F.lit(self._const_scalar(node.args[1], "max"))
        else:
            mn = F.lit(self._const_scalar(node.args[1], "min"))
            mx = F.lit(float("inf"))
        out = vec.df.withColumn("value", sf.promql_clamp(F.col("value"), mn, mx))
        return VectorResult(self._drop_name(out))

    # ----------------------------------------------------------- aggregation
    def eval_aggregation(self, node: AggregateExpr) -> VectorResult:
        vec = self._vector_arg(node.expr)
        df = vec.df
        mode = "without" if node.without else "by"
        gsig = sig_of(F.col("labels"), node.grouping, mode)
        glabels = (
            labels_without(F.col("labels"), node.grouping)
            if node.without
            else labels_keep(F.col("labels"), node.grouping)
        )
        df = df.withColumn("gsig", gsig).withColumn("glabels", glabels)

        op = node.op
        if op in ("topk", "bottomk"):
            # k may be any scalar expression, e.g. topk(scalar(foo), v)
            # (aggregators.test:321); constant k stays a literal
            kres = self.eval(node.param)
            if not isinstance(kres, ScalarResult):
                raise PromQLEvalError(f"{op} k must be a scalar")
            # per (step, group) ranked window — keeps ORIGINAL series labels
            # (engine.go:2740-2776); NaN ranks last like the reference heap
            order = [F.isnan("value").asc()]
            order.append(
                F.col("value").desc() if op == "topk" else F.col("value").asc()
            )
            w = Window.partitionBy("t", "gsig").orderBy(*order)
            ranked = df.withColumn("__rn", F.row_number().over(w))
            if kres.is_const:
                k = int(kres.const)
                if k < 1:
                    return VectorResult(
                        df.filter(F.lit(False)).select("t", "labels", "sig", "value")
                    )
                out = ranked.filter(F.col("__rn") <= k)
            else:
                kdf = kres.df.select(
                    "t", F.col("value").cast("long").alias("__k")
                )
                out = ranked.join(kdf, "t").filter(F.col("__rn") <= F.col("__k"))
            out = out.select("t", "labels", "sig", "value")
            # the reference's heap pops in value order — the result vector
            # is SORTED (desc for topk, asc for bottomk, NaN last;
            # aggregators.test eval_ordered)
            return VectorResult(out.orderBy(*order), order_by=order)

        if op == "count_values":
            lbl = self._const_string(node.param)
            formatted = _format_float(F.col("value"))
            df = df.withColumn(
                "glabels",
                F.map_concat(
                    F.map_filter(F.col("glabels"), lambda k_, _: k_ != F.lit(lbl)),
                    F.create_map(F.lit(lbl), formatted),
                ),
            ).withColumn("gsig", sig(F.col("glabels")))
            # aggregate primitives only; glabels == map_from_entries(gsig),
            # so rebuilding it post-agg keeps the buffer hash-aggregable
            # (a map-typed any_value buffer forces SortAggregate)
            out = (
                df.groupBy("t", "gsig")
                .agg(F.count(F.lit(1)).cast("double").alias("value"))
                .select(
                    "t",
                    F.map_from_entries("gsig").alias("labels"),
                    F.col("gsig").alias("sig"),
                    "value",
                )
            )
            return VectorResult(out)

        if op == "avg":
            # reference avg is an incremental mean (no intermediate-sum
            # overflow: aggregators.test 'big'/'bigzero'). Spark analog: a
            # second sum pre-scaled by 2^-64 (exact — exponent shift only)
            # decides the answer when the plain sum overflows to ±Inf.
            two64 = 2.0**64
            inf = float("inf")
            plain = F.col("__s") / F.col("__n")
            scaled = F.col("__ss") / F.col("__n") * F.lit(two64)
            value = F.when(
                F.isnan(F.col("__s")) | (F.abs(F.col("__s")) != F.lit(inf)),
                plain,
            ).otherwise(
                F.when(F.abs(F.col("__ss")) != F.lit(inf), scaled).otherwise(plain)
            )
            out = (
                df.groupBy("t", "gsig")
                .agg(
                    F.sum("value").alias("__s"),
                    F.sum(F.col("value") * F.lit(2.0**-64)).alias("__ss"),
                    F.count(F.lit(1)).cast("double").alias("__n"),
                )
                .select(
                    "t",
                    F.map_from_entries("gsig").alias("labels"),
                    F.col("gsig").alias("sig"),
                    value.alias("value"),
                )
            )
            return VectorResult(out)

        agg = {
            "sum": F.sum("value"),
            "count": F.count(F.lit(1)).cast("double"),
            "group": F.lit(1.0),
            "stddev": F.stddev_pop("value"),
            "stdvar": F.var_pop("value"),
            "min": F.coalesce(
                F.min(F.when(~F.isnan("value"), F.col("value"))),
                F.lit(float("nan")),
            ),
            "max": F.coalesce(
                F.max(F.when(~F.isnan("value"), F.col("value"))),
                F.lit(float("nan")),
            ),
        }.get(op)
        if op == "quantile":
            qres = self.eval(node.param)
            if not isinstance(qres, ScalarResult):
                raise PromQLEvalError("quantile φ must be a scalar")
            if qres.is_const:
                q = float(qres.const)
                if math.isnan(q):
                    agg = F.lit(float("nan"))
                elif q < 0:
                    agg = F.lit(float("-inf"))
                elif q > 1:
                    agg = F.lit(float("inf"))
                else:
                    agg = F.expr(f"percentile(value, {q!r})")
            else:
                # per-step φ (e.g. quantile(scalar(foo), v)): join the
                # scalar by step and interpolate over the sorted group —
                # Spark's percentile() needs a foldable fraction, so the
                # rank interpolation (quantile.go:50-75) is spelled out
                df = df.join(
                    qres.df.select("t", F.col("value").alias("__q")), "t"
                )
                vals = F.array_sort(
                    F.collect_list(F.col("value").cast("double"))
                )
                q = F.first("__q")
                n = F.size(vals)
                rank = q * (n.cast("double") - 1)
                lo = F.floor(rank).cast("int")
                hi = F.least(lo + 1, n - 1)
                frac = rank - lo.cast("double")
                interp = (
                    F.element_at(vals, lo + 1) * (F.lit(1.0) - frac)
                    + F.element_at(vals, hi + 1) * frac
                )
                agg_expr = (
                    F.when(F.isnan(q), F.lit(float("nan")))
                    .when(q < 0, F.lit(float("-inf")))
                    .when(q > 1, F.lit(float("inf")))
                    .otherwise(interp)
                )
                out = (
                    df.groupBy("t", "gsig")
                    .agg(agg_expr.alias("value"))
                    .select(
                        "t",
                        F.map_from_entries("gsig").alias("labels"),
                        F.col("gsig").alias("sig"),
                        "value",
                    )
                )
                return VectorResult(out)
        if agg is None:
            raise PromQLEvalError(f"unsupported aggregation {op!r}")
        out = (
            df.groupBy("t", "gsig")
            .agg(agg.alias("value"))
            .select(
                "t",
                F.map_from_entries("gsig").alias("labels"),
                F.col("gsig").alias("sig"),
                "value",
            )
        )
        return VectorResult(out)

    # ------------------------------------------------------------ binary ops
    def eval_binary(self, node: BinaryExpr):
        lhs = self.eval(node.lhs)
        rhs = self.eval(node.rhs)
        if isinstance(lhs, ScalarResult) and isinstance(rhs, ScalarResult):
            return self._scalar_scalar(node, lhs, rhs)
        if isinstance(lhs, VectorResult) and isinstance(rhs, ScalarResult):
            return self._vector_scalar(node, lhs, rhs, scalar_on_left=False)
        if isinstance(lhs, ScalarResult) and isinstance(rhs, VectorResult):
            return self._vector_scalar(node, rhs, lhs, scalar_on_left=True)
        if isinstance(lhs, VectorResult) and isinstance(rhs, VectorResult):
            if node.op in ast.SET_OPS:
                return self._set_op(node, lhs, rhs)
            return self._vector_vector(node, lhs, rhs)
        raise PromQLEvalError(f"bad operand types for {node.op}")

    def _scalar_scalar(self, node, lhs: ScalarResult, rhs: ScalarResult):
        op = node.op
        if op in ast.COMPARE_OPS and not node.return_bool:
            raise PromQLEvalError("comparisons between scalars must use bool")
        if lhs.is_const and rhs.is_const:
            return ScalarResult(const=_py_binop(op, lhs.const, rhs.const, node.return_bool))
        ldf = lhs.df if lhs.df is not None else None
        l = F.lit(lhs.const) if lhs.is_const else F.col("lv")
        r = F.lit(rhs.const) if rhs.is_const else F.col("rv")
        base = (
            (ldf.withColumnRenamed("value", "lv") if ldf is not None else None)
        )
        if not lhs.is_const and not rhs.is_const:
            base = base.join(rhs.df.withColumnRenamed("value", "rv"), "t")
        elif lhs.is_const:
            base = rhs.df.withColumnRenamed("value", "rv")
        if op in ast.COMPARE_OPS:
            value = F.when(sf.ieee_compare(l, r, op), F.lit(1.0)).otherwise(F.lit(0.0))
        else:
            value = sf.arith_op(l, r, op)
        return ScalarResult(df=base.select("t", value.alias("value")))

    def _vector_scalar(
        self, node, vec: VectorResult, scalar: ScalarResult, scalar_on_left: bool
    ):
        op = node.op
        df = vec.df
        if scalar.is_const:
            s = F.lit(scalar.const)
        else:
            df = df.join(
                scalar.df.withColumnRenamed("value", "__sv"), "t"
            )
            s = F.col("__sv")
        v = F.col("value")
        l, r = (s, v) if scalar_on_left else (v, s)
        if op in ast.COMPARE_OPS:
            keep = sf.ieee_compare(l, r, op)
            if node.return_bool:
                out = df.withColumn(
                    "value", F.when(keep, F.lit(1.0)).otherwise(F.lit(0.0))
                )
                out = self._drop_name(out)
            else:
                out = df.filter(keep)
        else:
            out = df.withColumn("value", sf.arith_op(l, r, op))
            out = self._drop_name(out)
        if "__sv" in out.columns:
            out = out.drop("__sv")
        return VectorResult(out)

    def _match_sig(self, node: BinaryExpr) -> tuple[str, list[str]]:
        m = node.matching
        if m is not None and m.on:
            return "on", m.matching_labels
        return "ignoring", (m.matching_labels if m else [])

    def _set_op(self, node: BinaryExpr, lhs: VectorResult, rhs: VectorResult):
        mode, keys = self._match_sig(node)
        msig = sig_of(F.col("labels"), keys, mode)
        l = lhs.df.withColumn("msig", msig)
        r = rhs.df.withColumn("msig", msig)
        if node.op == "and":
            out = l.join(r.select("t", "msig").distinct(), ["t", "msig"], "left_semi")
        elif node.op == "unless":
            out = l.join(r.select("t", "msig").distinct(), ["t", "msig"], "left_anti")
        else:  # or — engine.go:2150-2175
            extra = r.join(
                l.select("t", "msig").distinct(), ["t", "msig"], "left_anti"
            )
            cols = ["t", "labels", "sig", "value", "msig"]
            out = l.select(*cols).unionByName(extra.select(*cols))
        return VectorResult(out.drop("msig"))

    def _vector_vector(self, node: BinaryExpr, lhs: VectorResult, rhs: VectorResult):
        """engine.go:2201-2378 VectorBinop as an equi-join on (t, match-sig)."""
        op = node.op
        m = node.matching
        card = m.card if m else VectorMatchCard.ONE_TO_ONE
        mode, keys = self._match_sig(node)
        msig = sig_of(F.col("labels"), keys, mode)

        l = lhs.df.select(
            "t",
            msig.alias("msig"),
            F.col("labels").alias("llabels"),
            F.col("value").alias("lv"),
        )
        r = rhs.df.select(
            "t",
            msig.alias("msig"),
            F.col("labels").alias("rlabels"),
            F.col("value").alias("rv"),
        )
        if self.ctx.check_matching:
            # engine.go:2228-2246: the 'one' side must be unique per match
            # group (both sides for one-to-one). Lazy runtime assertion,
            # expressed as a hash aggregation on the join key rather than a
            # window: partial map-side counts collapse the side to one row
            # per (t, msig) with no sort, and the join downstream reuses the
            # aggregation's hash partitioning. At shuffle-join scale the
            # exchange this adds is the same one the join needs, so the
            # check is ~free; for broadcast-sized sides it adds two small
            # exchanges. Measured on the sf0.1 binop bench (best-of-6):
            # window version +46%, this version +28% (0.75s vs 0.59s off),
            # all of it stage-scheduling latency on tiny inputs.
            def _unique_one_side(df, labels_col, val_col):
                agged = df.groupBy("t", "msig").agg(
                    F.count(F.lit(1)).alias("__c"),
                    F.first(labels_col).alias(labels_col),
                    F.first(val_col).alias("__v"),
                )
                return agged.withColumn(
                    val_col,
                    F.when(
                        F.col("__c") > 1,
                        F.assert_true(
                            F.lit(False),
                            F.lit("many-to-many matching not allowed: matching "
                                  "labels must be unique on one side"),
                        ).cast("double"),
                    ).otherwise(F.col("__v")),
                ).drop("__c", "__v")

            if card in (VectorMatchCard.ONE_TO_ONE, VectorMatchCard.MANY_TO_ONE):
                r = _unique_one_side(r, "rlabels", "rv")
            if card in (VectorMatchCard.ONE_TO_ONE, VectorMatchCard.ONE_TO_MANY):
                l = _unique_one_side(l, "llabels", "lv")
        joined = l.join(r, ["t", "msig"], "inner")

        lv, rv = F.col("lv"), F.col("rv")
        should_drop = op in ast.ARITH_OPS or (
            op in ast.COMPARE_OPS and node.return_bool
        )

        # result labels — engine.go resultMetric (2324-2360)
        if card == VectorMatchCard.ONE_TO_MANY:
            base_labels = F.col("rlabels")  # many side
            one_labels = F.col("llabels")
        else:
            base_labels = F.col("llabels")
            one_labels = F.col("rlabels")
        out_labels = base_labels
        if should_drop:
            out_labels = F.map_filter(out_labels, lambda k, _: k != F.lit(NAME_LABEL))
        if card == VectorMatchCard.ONE_TO_ONE:
            if mode == "on":
                keyset = F.array(*[F.lit(k) for k in keys])
                out_labels = F.map_filter(
                    out_labels, lambda k, _: F.array_contains(keyset, k)
                )
            elif keys:
                dropset = F.array(*[F.lit(k) for k in keys])
                out_labels = F.map_filter(
                    out_labels, lambda k, _: ~F.array_contains(dropset, k)
                )
        if m and m.include:
            for ln in m.include:
                inc = one_labels.getItem(ln)
                out_labels = F.when(
                    inc.isNotNull() & (inc != ""),
                    F.map_concat(
                        F.map_filter(out_labels, lambda k, _: k != F.lit(ln)),
                        F.create_map(F.lit(ln), inc),
                    ),
                ).otherwise(
                    F.map_filter(out_labels, lambda k, _: k != F.lit(ln))
                )

        if card == VectorMatchCard.ONE_TO_MANY:
            # swap so that lv is the "left" operand per PromQL semantics
            pass  # lv/rv keep expression order: lhs op rhs

        if op in ast.COMPARE_OPS:
            keep = sf.ieee_compare(lv, rv, op)
            if node.return_bool:
                value = F.when(keep, F.lit(1.0)).otherwise(F.lit(0.0))
                out = joined.select(
                    "t",
                    out_labels.alias("labels"),
                    value.alias("value"),
                )
            else:
                # vectorElemBinop returns the ORIGINAL lhs value even under
                # group_right (engine.go:2270-2276 double swap)
                out = joined.filter(keep).select(
                    "t",
                    out_labels.alias("labels"),
                    F.col("lv").alias("value"),
                )
        else:
            value = sf.arith_op(lv, rv, op)
            out = joined.select(
                "t", out_labels.alias("labels"), value.alias("value")
            )
        out = out.withColumn("sig", sig(F.col("labels"))).select(
            "t", "labels", "sig", "value"
        )
        return VectorResult(out)

    # ----------------------------------------------------------------- unary
    def eval_unary(self, node: UnaryExpr):
        inner = self.eval(node.expr)
        if node.op == "+":
            return inner
        if isinstance(inner, ScalarResult):
            if inner.is_const:
                return ScalarResult(const=-inner.const)
            return ScalarResult(df=inner.df.withColumn("value", -F.col("value")))
        if isinstance(inner, VectorResult):
            out = self._drop_name(inner.df.withColumn("value", -F.col("value")))
            return VectorResult(out)
        raise PromQLEvalError("cannot negate a string")

    # ------------------------------------------------------------------ misc
    def _vector_arg(self, node: ast.Node) -> VectorResult:
        res = self.eval(node)
        if isinstance(res, ScalarResult):
            raise PromQLEvalError("expected an instant vector, got scalar")
        if not isinstance(res, VectorResult):
            raise PromQLEvalError("expected an instant vector")
        return res

    def _const_scalar(self, node: ast.Node, what: str) -> float:
        res = self.eval(node)
        if isinstance(res, ScalarResult) and res.is_const:
            return float(res.const)
        raise PromQLEvalError(f"{what} must be a constant scalar expression")

    def _const_string(self, node: ast.Node) -> str:
        res = self.eval(node)
        if isinstance(res, StringResult):
            return res.value
        raise PromQLEvalError("expected a string literal")

    def _scalar_to_vector(self, s: ScalarResult, ctx: EvalContext) -> DataFrame:
        empty = F.expr("cast(map() as map<string,string>)")
        if s.is_const:
            base = Evaluator(ctx).steps_df().select(
                "t", F.lit(float(s.const)).alias("value")
            )
        else:
            base = s.df
        return base.select(
            "t",
            empty.alias("labels"),
            sig(empty).alias("sig"),
            F.col("value").alias("value"),
        )

    def _drop_name(self, df: DataFrame, check: bool | None = None) -> DataFrame:
        """Drop __name__ from series identity (function/operator output).

        When duplicate detection is on, assert no two series collapse onto
        the same labelset (engine.go's "vector cannot contain metrics with
        the same labelset", raised for e.g. ceil({__name__=~'a|b'}) —
        collision.test). Hash-aggregation assertion like the binop matching
        check — no window sort in the plan tail."""
        labels = F.map_filter(F.col("labels"), lambda k, _: k != F.lit(NAME_LABEL))
        out = df.withColumn("labels", labels).withColumn("sig", sig(F.col("labels")))
        return self._check_unique(out, check)

    def _check_unique(self, df: DataFrame, check: bool | None = None) -> DataFrame:
        """Lazy assertion that no two output series share a labelset at a
        step — engine.go's ContainsSameLabelset() check, applied to every
        function-call output (engine.go:1601-1602, also raised for e.g.
        changes({__name__=~'a|b'}[5m]) and collapsing label_replace —
        functions.test).

        Expressed as a hash aggregation on (t, sig) — NOT a window: a
        window count forces exchange + full sort in the plan tail, while
        the groupBy keeps map-side partial counts, skips the sort, and
        lets downstream (t, sig)-keyed stages reuse its partitioning
        (measured on the binop path in round 3; same shape here). With no
        duplicates — the only passing case — first() per group is the
        identity, so results are bit-identical."""
        do_check = self.ctx.check_matching if check is None else check
        if do_check and "value" in df.columns and "t" in df.columns:
            cols = df.columns
            # labels == map_from_entries(sig) by construction; rebuilding it
            # post-agg keeps every buffer primitive (a map-typed first()
            # buffer would demote the whole aggregation to SortAggregate)
            others = [c for c in cols if c not in ("t", "sig", "labels")]
            grouped = df.groupBy("t", "sig").agg(
                F.count(F.lit(1)).alias("__dup_n"),
                *[F.first(c).alias(c) for c in others],
            )
            if "labels" in cols:
                grouped = grouped.withColumn(
                    "labels", F.map_from_entries("sig")
                )
            df = grouped.withColumn(
                "value",
                F.when(
                    F.col("__dup_n") > 1,
                    F.assert_true(
                        F.lit(False),
                        F.lit("vector cannot contain metrics with the "
                              "same labelset"),
                    ).cast("double"),
                ).otherwise(F.col("value")),
            ).select(*cols)
        return df


def _format_float(value: Column) -> Column:
    """Go strconv.FormatFloat(v, 'f', -1, 64)-style rendering for
    count_values label values: integral floats print without a decimal, and
    NOTHING prints in scientific notation.

    Java's double→string (what a plain cast gives) switches to "d.fffE±x"
    outside [1e-3, 1e7); Go's 'f' format never does. Expand the scientific
    form to positional decimal with pure string ops — the digits are
    unchanged, so the shortest-round-trip property is preserved.
    """
    as_long = value.try_cast("long")  # overflows (|v| > 2^63) → null
    s = value.cast("string")
    sign = F.when(s.startswith("-"), F.lit("-")).otherwise(F.lit(""))
    body = F.regexp_replace(s, "^-", "")
    mant = F.split_part(body, F.lit("E"), F.lit(1))
    exp = F.split_part(body, F.lit("E"), F.lit(2)).cast("int")
    ipart = F.split_part(mant, F.lit("."), F.lit(1))  # single digit (Java norm)
    frac0 = F.split_part(mant, F.lit("."), F.lit(2))
    frac = F.when(frac0 == F.lit("0"), F.lit("")).otherwise(frac0)
    digits = F.concat(ipart, frac)
    flen = F.length(frac)

    def zeros(n: Column) -> Column:
        return F.repeat(F.lit("0"), n)

    expanded = (
        F.when(exp < 0, F.concat(F.lit("0."), zeros(-exp - F.lit(1)), digits))
        .when(exp >= flen, F.concat(digits, zeros(exp - flen)))
        .otherwise(
            F.concat(
                F.substr(digits, F.lit(1), exp + F.lit(1)),
                F.lit("."),
                F.substr(digits, exp + F.lit(2)),
            )
        )
    )
    return (
        F.when(F.isnan(value), F.lit("NaN"))
        .when(value == F.lit(float("inf")), F.lit("+Inf"))
        .when(value == F.lit(float("-inf")), F.lit("-Inf"))
        .when(s == F.lit("-0.0"), F.lit("-0"))
        .when(value.cast("double") == as_long.cast("double"), as_long.cast("string"))
        .when(s.contains("E"), F.concat(sign, expanded))
        .otherwise(s)
    )


def _py_simple_math(name: str, v: float) -> float:
    import math as _m

    def _go_log(fn):
        # Go math: log(0) = -Inf, log(x<0) = NaN (Python raises instead)
        def wrapped(x):
            if _m.isnan(x) or x < 0:
                return float("nan")
            if x == 0:
                return float("-inf")
            return fn(x)

        return wrapped

    fns = {
        "abs": abs,
        "ceil": _m.ceil,
        "floor": _m.floor,
        "exp": _m.exp,
        "sqrt": _m.sqrt,
        "ln": _go_log(_m.log),
        "log2": _go_log(_m.log2),
        "log10": _go_log(_m.log10),
        "sgn": lambda x: float((x > 0) - (x < 0)),
        "sin": _m.sin,
        "cos": _m.cos,
        "tan": _m.tan,
        "asin": _m.asin,
        "acos": _m.acos,
        "atan": _m.atan,
        "sinh": _m.sinh,
        "cosh": _m.cosh,
        "tanh": _m.tanh,
        "asinh": _m.asinh,
        "acosh": _m.acosh,
        "atanh": _m.atanh,
        "deg": _m.degrees,
        "rad": _m.radians,
    }
    try:
        return float(fns[name](v))
    except ValueError:
        return float("nan")


def _py_binop(op: str, l: float, r: float, return_bool: bool) -> float:
    import math as _m

    if op in ast.COMPARE_OPS:
        res = {
            "==": l == r,
            "!=": l != r,
            ">": l > r,
            "<": l < r,
            ">=": l >= r,
            "<=": l <= r,
        }[op]
        return 1.0 if res else 0.0
    if op == "+":
        return l + r
    if op == "-":
        return l - r
    if op == "*":
        return l * r
    if op == "/":
        if r == 0:
            if l == 0 or _m.isnan(l):
                return float("nan")
            # IEEE: the zero divisor's SIGN matters — x / -0 = -Inf for x > 0
            sign = _m.copysign(1.0, r) * (1.0 if l > 0 else -1.0)
            return _m.copysign(float("inf"), sign)
        return l / r
    if op == "%":
        return _m.fmod(l, r) if r != 0 else float("nan")
    if op == "^":
        # Go math.Pow never raises: (-1)^0.5 = NaN, 0^-1 = +Inf, (-0)^-1 = -Inf
        def _odd_int(x: float) -> bool:
            return x == int(x) and int(x) % 2 != 0

        try:
            return _m.pow(l, r)
        except ValueError:
            if l == 0:  # zero base, negative exponent → ±Inf
                neg = _m.copysign(1.0, l) < 0 and _odd_int(r)
                return float("-inf") if neg else float("inf")
            return float("nan")  # negative base, non-integral exponent
        except OverflowError:  # finite inputs, |result| > max double
            neg = l < 0 and _odd_int(r)
            return float("-inf") if neg else float("inf")
    if op == "atan2":
        return _m.atan2(l, r)
    raise PromQLEvalError(f"bad scalar op {op}")
