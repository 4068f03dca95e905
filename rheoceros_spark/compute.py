"""Compute descriptors — the UDF surface (SURVEY §2.10).

Three slot kinds, mirroring the reference's contract:

* :class:`Spark` — user PySpark, either a **function**
  ``(inputs: dict[str, DataFrame], ctx) -> DataFrame`` (preferred: no
  ``exec``, testable, picklable) or a **code string** executed with the
  reference's script contract: aliased DataFrames + ``input0..N`` +
  ``dimensions`` + ``args`` + ``spark`` in scope, must assign
  ``output`` (reference ``glueetl_default_ABI.py:41-62,303-345``).
* :class:`SparkSQL` — semicolon-split statements ``spark.sql()``'d in
  order, last one is the output (reference ``api_ext.py:192-228``);
  inputs pre-registered as temp views under their alias and
  ``input{i}`` (``glueetl_default_ABI.py:303-322``); ``{dim}``
  placeholders substituted with output dimension values (PrestoSQL
  parametrization parity, ``aws_athena.py:541-563``).
* :class:`InlinedCompute` — driver-side Python callback
  ``f(input_map, output, params)``; not a row UDF (reference
  ``api.py:74-82``, executed at ``constructs.py:3503-3541``).

Everything row-level inside a slot is plain DataFrame API / Spark SQL,
so Catalyst owns optimization end-to-end.
"""

from __future__ import annotations

import importlib
import inspect
import re
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from pyspark.sql import DataFrame, SparkSession

#: Descriptor kwargs that are cluster-resource hints, not user args
#: (reference api_ext.py:107-190: NumberOfWorkers/WorkerType on Glue,
#: InstanceConfig on EMR, spark_submit_args passthrough).  One local
#: Spark runtime replaces the reference's driver fleet (SURVEY §2.11),
#: so these become session-conf knobs instead of provisioning calls.
RESOURCE_CONF_KEYS = frozenset(
    {
        "NumberOfWorkers",
        "WorkerType",
        "GlueVersion",
        "Timeout",
        "InstanceConfig",
        "RuntimeConfig",
        "spark_submit_args",
        "extra_jars",
        "retry_count",
    }
)


def _split_resource_conf(args: dict[str, Any]) -> tuple[dict[str, Any], dict[str, Any]]:
    resource = {k: v for k, v in args.items() if k in RESOURCE_CONF_KEYS}
    user = {k: v for k, v in args.items() if k not in RESOURCE_CONF_KEYS}
    return resource, user


class ComputeInternalError(Exception):
    """A slot failed for an application-internal reason (reference
    ``definitions/compute.py:252-257``)."""


class ComputeRetryableInternalError(ComputeInternalError):
    """A slot failed transiently — the orchestrator retries it
    (reference ``definitions/compute.py:256``, retried at
    ``constructs.py:4400``).  The reference retries TRANSIENT failures
    on every orchestration cycle; in-process execution bounds the loop
    with ``Application(transient_retry_limit=N)``."""


class ComputeKilledError(Exception):
    """An execution was force-stopped via :meth:`Application.kill`
    (reference ``ComputeFailedSessionStateType.FORCE_STOPPED``,
    ``definitions/compute.py:38-41``)."""


def _apply_resource_conf(spark: SparkSession, resource_conf: dict[str, Any]) -> None:
    """Map provisioning hints onto the single-runtime session.

    ``NumberOfWorkers``/``InstanceConfig`` size the shuffle like the
    reference's per-worker task fan-out would (2 tasks per worker
    core-pair is Glue's effective default); explicit ``--conf k=v``
    pairs in ``spark_submit_args`` win, matching the reference's
    passthrough precedence (utils/spark.py:191-252)."""
    workers = resource_conf.get("NumberOfWorkers")
    if workers is None:
        ic = resource_conf.get("InstanceConfig")
        workers = getattr(ic, "instance_count", None) or (ic if isinstance(ic, int) else None)
    if workers:
        spark.conf.set("spark.sql.shuffle.partitions", str(max(int(workers) * 2, 32)))
    submit_args = resource_conf.get("spark_submit_args") or []
    if isinstance(submit_args, str):
        submit_args = submit_args.split()
    for i, tok in enumerate(submit_args):
        if tok == "--conf" and i + 1 < len(submit_args) and "=" in submit_args[i + 1]:
            k, v = submit_args[i + 1].split("=", 1)
            try:
                spark.conf.set(k, v)
            except Exception:
                pass  # static confs (e.g. memory) can't change on a live session


def resource_conf_touched_keys(resource_conf: dict[str, Any]) -> set[str]:
    """Session-conf keys :func:`_apply_resource_conf` would touch for
    this hint set — so the caller can snapshot/restore them around a
    slot's execution instead of leaking one node's hints into every
    subsequent execution."""
    keys: set[str] = set()
    ic = resource_conf.get("InstanceConfig")
    if resource_conf.get("NumberOfWorkers") or getattr(ic, "instance_count", None) or isinstance(ic, int):
        keys.add("spark.sql.shuffle.partitions")
    submit_args = resource_conf.get("spark_submit_args") or []
    if isinstance(submit_args, str):
        submit_args = submit_args.split()
    for i, tok in enumerate(submit_args):
        if tok == "--conf" and i + 1 < len(submit_args) and "=" in submit_args[i + 1]:
            keys.add(submit_args[i + 1].split("=", 1)[0])
    return keys


def snapshot_confs(spark: SparkSession, slots: Any) -> dict[str, Optional[str]]:
    """Current values of every conf key the given slots' resource hints
    could touch (None = currently unset)."""
    keys: set[str] = set()
    for slot in slots:
        keys |= resource_conf_touched_keys(getattr(slot, "resource_conf", None) or {})
    return {k: spark.conf.get(k, None) for k in keys}


def restore_confs(spark: SparkSession, snapshot: dict[str, Optional[str]]) -> None:
    """Put back (or unset) the snapshotted conf keys.  Call AFTER the
    execution's terminal action — reads are lazy, so the conf active at
    action time is what applies."""
    for k, v in snapshot.items():
        try:
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        except Exception:
            pass  # static confs can't change on a live session


@dataclass
class ComputeContext:
    """What a slot sees besides its inputs."""

    spark: SparkSession
    dimensions: dict[str, Any] = field(default_factory=dict)  # output dim values
    args: dict[str, Any] = field(default_factory=dict)
    output_alias: str = "output"


class ComputeDescriptor:
    is_batch = True  # ASYNC_BATCH_COMPUTE vs SYNC_INLINED (reference slot.py:16-32)

    @property
    def max_retry_count(self) -> int:
        """User-forced retries on ANY failure (reference slot.py:160 —
        'forced orchestration retries based on user provided
        retry_count', application.py:467)."""
        rc = getattr(self, "resource_conf", None) or {}
        return int(rc.get("retry_count", 0))

    def run(self, inputs: dict[str, DataFrame], ctx: ComputeContext) -> Optional[DataFrame]:
        raise NotImplementedError


class Spark(ComputeDescriptor):
    def __init__(self, code: Callable | str, **args: Any):
        self.code = code
        self.resource_conf, self.args = _split_resource_conf(args)

    def run(self, inputs: dict[str, DataFrame], ctx: ComputeContext) -> DataFrame:
        ctx.args.update(self.args)
        _apply_resource_conf(ctx.spark, self.resource_conf)
        if callable(self.code):
            out = self.code(inputs, ctx)
            if not isinstance(out, DataFrame):
                raise TypeError(f"Spark compute fn must return a DataFrame, got {type(out)}")
            return out
        # code-string mode (reference script contract)
        scope: dict[str, Any] = {
            "spark": ctx.spark,
            "sc": ctx.spark.sparkContext,
            "dimensions": ctx.dimensions,
            "args": ctx.args,
        }
        for i, (alias, df) in enumerate(inputs.items()):
            scope[alias] = df
            scope[f"input{i}"] = df
        code = _substitute_dims(self.code, ctx.dimensions)
        exec(compile(code, "<rheoceros_spark.Spark>", "exec"), scope)
        out = scope.get("output")
        if not isinstance(out, DataFrame):
            raise ValueError("Spark code string must assign a DataFrame to `output`")
        return out


class SparkSQL(ComputeDescriptor):
    def __init__(self, code: str, **args: Any):
        self.code = code
        self.resource_conf, self.args = _split_resource_conf(args)

    def run(self, inputs: dict[str, DataFrame], ctx: ComputeContext) -> DataFrame:
        _apply_resource_conf(ctx.spark, self.resource_conf)
        for i, (alias, df) in enumerate(inputs.items()):
            df.createOrReplaceTempView(alias)
            df.createOrReplaceTempView(f"input{i}")
        sql = _substitute_dims(self.code, ctx.dimensions)
        out: Optional[DataFrame] = None
        # semicolon-split, run in order, last statement is the output
        # (reference api_ext.py:192-228)
        for stmt in (s.strip() for s in sql.split(";")):
            if stmt:
                out = ctx.spark.sql(stmt)
        if out is None:
            raise ValueError("SparkSQL compute contained no statements")
        return out


# Presto/Trino functions whose Spark twin is an EXACT-semantics rename —
# translated in place so the common Presto-isms just work.  Anything
# whose twin differs on any input (NULL handling, non-scalar JSON, …)
# belongs in _PRESTO_REJECTS instead, no matter how close it looks.
_PRESTO_RENAMES = {
    "approx_distinct": "approx_count_distinct",
    "strpos": "instr",  # both (string, substring), 1-based, 0 = absent
    "contains": "array_contains",  # Presto contains() is array membership
    "week": "weekofyear",
    "week_of_year": "weekofyear",
    "day_of_month": "dayofmonth",
    # Presto element_at: NULL on out-of-bounds index / absent map key,
    # negative index from the end.  Spark's plain element_at raises
    # under ANSI mode (the Spark 4 default) — try_element_at matches
    # Presto on every Presto-VALID input (index 0 errors on Presto, so
    # it is outside the translated domain).
    "element_at": "try_element_at",
}

# Presto/Trino functions that either have NO Spark equivalent or — worse
# — share a name/shape with a Spark function of DIFFERENT semantics, so
# running them unchanged could return a silently wrong answer.  Each
# maps to the guidance embedded in the raised error.
_PRESTO_REJECTS = {
    "try": "wrap the specific operation in Spark's try_cast / try_divide / try_* functions",
    "array_agg": "Presto keeps NULL elements but Spark collect_list drops them — use collect_list (and handle NULLs explicitly) or filter first",
    "arbitrary": "Trino returns a NON-NULL value when one exists; Spark any_value(x) may return NULL — use any_value(x, true)",
    "json_extract_scalar": "Presto returns NULL for non-scalar matches but get_json_object returns the JSON text — use get_json_object and guard non-scalars explicitly",
    "json_extract": "use get_json_object (returns STRING, not JSON) and cast explicitly",
    "map_agg": "use map_from_entries(collect_list(struct(key, value)))",
    "multimap_agg": "use map_from_entries over collect_list of grouped structs",
    "map_union": "aggregate map entries explicitly (explode + groupBy + map_from_entries)",
    "histogram": "use groupBy(x).count() or count_min_sketch",
    "approx_set": "HLL sketch objects are engine-specific; use approx_count_distinct",
    "format_datetime": "use date_format — Joda patterns differ from Spark's (e.g. 'YYYY' vs 'yyyy')",
    "parse_datetime": "use to_timestamp(str, fmt) — Joda patterns differ from Spark's",
    "from_iso8601_timestamp": "use to_timestamp(str)",
    "from_iso8601_date": "use to_date(str)",
    "from_unixtime": "Presto returns TIMESTAMP but Spark returns STRING — use timestamp_seconds",
    "to_unixtime": "Presto returns DOUBLE (fractional secs) but Spark unix_timestamp returns BIGINT — use unix_timestamp or extract epoch explicitly",
    "approx_percentile": "Presto's 3-arg form approx_percentile(x, w, p) is WEIGHTED but Spark reads the 3rd arg as accuracy (silent collision), and the sketches differ — call Spark percentile_approx(col, p[, accuracy]) explicitly",
    "approx_most_frequent": "engine-specific sketch — use this engine's count-min heavy hitters (operators.sketches) or groupBy().count() with a limit",
    "split_part": "Presto returns NULL past the last part but Spark split_part returns '' — use element_at(split(...), n) semantics explicitly",
    "random": "Presto random(n) is an integer in [0, n) but Spark rand(n) reads n as a SEED — use floor(rand() * n) or rand() explicitly",
    "json_parse": "Presto's JSON type has no Spark twin — keep the value as STRING and use get_json_object / from_json with a schema",
    "json_format": "Presto's JSON type has no Spark twin — use to_json on a struct, or keep the STRING form",
    "url_extract_host": "use parse_url(url, 'HOST')",
    "url_extract_path": "use parse_url(url, 'PATH')",
    "url_extract_port": "use CAST(parse_url(url, 'PORT') AS INT) — Presto returns bigint",
    "url_extract_protocol": "use parse_url(url, 'PROTOCOL')",
    "url_extract_query": "use parse_url(url, 'QUERY')",
    "url_extract_fragment": "use parse_url(url, 'REF')",
    "url_extract_parameter": "use parse_url(url, 'QUERY', name)",
    "day_of_week": "Presto ISO numbering (Mon=1) differs from Spark dayofweek (Sun=1) — use ((dayofweek(x) + 5) % 7) + 1",
    "dow": "Presto ISO numbering (Mon=1) differs from Spark dayofweek (Sun=1) — use ((dayofweek(x) + 5) % 7) + 1",
    "split": "Presto's delimiter is a LITERAL but Spark's is a REGEX (split(x, '.') silently diverges) — regex-escape the delimiter and call Spark split explicitly",
    "day_of_year": "use dayofyear",
    "doy": "use dayofyear",
    "year_of_week": "ISO week-year has no direct Spark builtin — derive from weekofyear/year",
    "yow": "ISO week-year has no direct Spark builtin — derive from weekofyear/year",
}

# Presto date_add(unit, n, ts) / date_diff(unit, a, b): the unit-string
# forms translate to Spark timestampadd/timestampdiff — but ONLY for
# fixed-length units, where both engines do exact microsecond-interval
# arithmetic with truncation toward zero, so the results are provably
# identical.  Calendar units (month/quarter/year) involve day-of-month
# saturation rules that cannot be verified equivalent here, and
# date_add with day/week on a DATE input returns DATE on Presto but
# TIMESTAMP via timestampadd — both are rejected with a port hint
# instead of silently shifting semantics or types.
_PRESTO_UNIT_FNS = {"date_add": "timestampadd", "date_diff": "timestampdiff"}
_PRESTO_ADD_UNITS = {"millisecond", "second", "minute", "hour"}
_PRESTO_DIFF_UNITS = _PRESTO_ADD_UNITS | {"day", "week"}
_PRESTO_UNIT_PORT = {
    "date_add": "for day/week use Spark date_add(date, n)/dateadd, for month/quarter/year use add_months — check day-of-month saturation against your Presto output",
    "date_diff": "for month/quarter/year use months_between/timestampdiff and check day-of-month edge cases against your Presto output",
}
_UNIT_LITERAL = re.compile(r"\s*'([A-Za-z_]+)'\s*,")

# one pass: string literals AND comments ('--' line, '/* */' block) are
# matched first (and skipped verbatim) so function names inside either
# are never touched; identifiers directly followed by "(" are candidate
# function calls.  An apostrophe inside a comment ("-- don't") must not
# desynchronize literal tracking — hence comments in the same pass.
_SQL_FN_OR_STR = re.compile(
    r"('(?:[^']|'')*')"          # string literal
    r"|(--[^\n]*|/\*.*?\*/)"     # comment
    r"|\b([A-Za-z_][A-Za-z0-9_]*)\s*\(",
    re.DOTALL,
)


def translate_presto_sql(sql: str) -> str:
    """Presto/Trino → Spark SQL dialect pass: rename exact-equivalent
    functions, raise loudly on known-divergent ones (reference surface
    ``api_ext.py:230-233``, ``aws_athena.py:541-663``).  Anything not in
    either table passes through untouched (the ANSI subset both
    dialects share); string literals and comments are never scanned."""
    out: list[str] = []
    last = 0
    for m in _SQL_FN_OR_STR.finditer(sql):
        if m.group(3) is None:  # string literal or comment — skip verbatim
            continue
        name = m.group(3).lower()
        if name in _PRESTO_UNIT_FNS:
            um = _UNIT_LITERAL.match(sql, m.end())
            unit = um.group(1).lower() if um else None
            allowed = _PRESTO_ADD_UNITS if name == "date_add" else _PRESTO_DIFF_UNITS
            if unit not in allowed:
                raise NotImplementedError(
                    f"PrestoSQL: {name}({unit or '<non-literal unit>'}, ...) has no "
                    f"exact-semantics Spark twin and is refused rather than silently "
                    f"mis-run. Port: {_PRESTO_UNIT_PORT[name]}."
                )
            out.append(sql[last : m.start(3)])
            out.append(f"{_PRESTO_UNIT_FNS[name]}({unit.upper()},")
            last = um.end()
            continue
        if name in _PRESTO_REJECTS:
            raise NotImplementedError(
                f"PrestoSQL: {name!r} diverges between Presto and Spark SQL "
                f"and is refused rather than silently mis-run. Port: {_PRESTO_REJECTS[name]}."
            )
        if name in _PRESTO_RENAMES:
            out.append(sql[last : m.start(3)])
            out.append(_PRESTO_RENAMES[name])
            last = m.end(3)
    out.append(sql[last:])
    return "".join(out)


class PrestoSQL(SparkSQL):
    """Descriptor for the reference's ``PrestoSQL`` slots (reference
    ``api_ext.py:230-233``; ``aws_athena.py:541-563``): same ``{dim}``
    parametrization and per-alias views, executed on Spark SQL after a
    dialect pass — exact-equivalent Presto functions are renamed to
    their Spark twins (:data:`_PRESTO_RENAMES`) and known-divergent
    ones are rejected loudly at *construction* time
    (:data:`_PRESTO_REJECTS`), so a Presto-ism can never silently
    return a wrong answer.  The shared ANSI subset runs unchanged."""

    def __init__(self, code: str, **args: Any):
        super().__init__(translate_presto_sql(code), **args)


class InlinedCompute(ComputeDescriptor):
    is_batch = False

    def __init__(self, fn: Callable[..., Any], retry_count: int = 0):
        self.fn = fn
        self.resource_conf = {"retry_count": retry_count} if retry_count else {}

    def run_inlined(self, input_map: dict[str, Any], output: Any, params: dict[str, Any]) -> Any:
        return self.fn(input_map, output, params)

    def run(self, inputs: dict[str, DataFrame], ctx: ComputeContext) -> Optional[DataFrame]:
        return None  # inlined slots do not produce the output DataFrame


def python_module(module: str, **args: Any) -> Spark:
    """Reference a Python module as a slot instead of an inline string
    (reference ``api_ext.py:1168-1213``, ``python_module``).

    The module's *source text* is embedded as the slot's code string,
    so it runs under the script contract (aliased inputs, ``input0..N``,
    ``dimensions``, ``args``, ``spark`` in scope, assigns ``output``) —
    identical to the reference, which ships the module source to the
    Glue/EMR job."""
    mod = importlib.import_module(module)
    return Spark(inspect.getsource(mod), **args)


def sql_module(module_or_path: str, **args: Any) -> SparkSQL:
    """Reference a ``.sql`` file or a module exposing ``SQL``/``sql``
    as a :class:`SparkSQL` slot (reference ``api_ext.py`` ``sql_module``)."""
    if module_or_path.endswith(".sql"):
        with open(module_or_path, "r", encoding="utf-8") as f:
            return SparkSQL(f.read(), **args)
    mod = importlib.import_module(module_or_path)
    code = getattr(mod, "SQL", None) or getattr(mod, "sql", None)
    if not isinstance(code, str):
        raise ValueError(f"{module_or_path!r} must define a string attribute `SQL` (or `sql`)")
    return SparkSQL(code, **args)


def scala_script(*_args: Any, **_kwargs: Any) -> ComputeDescriptor:
    """The reference supports Scala slots on Glue/EMR
    (``api_ext.py:1168-1213``).  This engine is PySpark-native; JVM-language
    slots are out of scope — express the logic as :class:`SparkSQL`
    (dialect-identical) or a :class:`Spark` function."""
    raise NotImplementedError(
        "scala_script is not supported: use SparkSQL(...) or Spark(fn) — "
        "the SQL surface is identical on the JVM"
    )


_DIM_TOKEN = re.compile(r"\{(\w+)\}")


def _substitute_dims(code: str, dimensions: dict[str, Any]) -> str:
    """``{dim}`` parametrization (reference aws_athena.py:541-555):
    only tokens that name an output dimension are substituted."""

    def sub(m: re.Match) -> str:
        name = m.group(1)
        if name in dimensions:
            return str(dimensions[name])
        return m.group(0)

    return _DIM_TOKEN.sub(sub, code)
