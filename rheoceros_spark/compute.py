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

import re
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class ComputeContext:
    """What a slot sees besides its inputs."""

    spark: SparkSession
    dimensions: dict[str, Any] = field(default_factory=dict)  # output dim values
    args: dict[str, Any] = field(default_factory=dict)
    output_alias: str = "output"


class ComputeDescriptor:
    is_batch = True  # ASYNC_BATCH_COMPUTE vs SYNC_INLINED (reference slot.py:16-32)

    def run(self, inputs: dict[str, DataFrame], ctx: ComputeContext) -> Optional[DataFrame]:
        raise NotImplementedError


class Spark(ComputeDescriptor):
    def __init__(self, code: Callable | str, **args: Any):
        self.code = code
        self.args = args

    def run(self, inputs: dict[str, DataFrame], ctx: ComputeContext) -> DataFrame:
        ctx.args.update(self.args)
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
        self.args = args

    def run(self, inputs: dict[str, DataFrame], ctx: ComputeContext) -> DataFrame:
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


class PrestoSQL(SparkSQL):
    """API-parity descriptor for the reference's ``PrestoSQL`` slots
    (reference ``api_ext.py:230-233``; ``aws_athena.py:541-563``):
    same ``{dim}`` parametrization and per-alias views, executed on
    Spark SQL.  ANSI constructs shared by both dialects run unchanged;
    Presto-isms (``approx_distinct`` etc.) must be ported by the user —
    parity is at the descriptor/parametrization level, and the engine's
    oracle-checked queries pin the ANSI subset."""


class InlinedCompute(ComputeDescriptor):
    is_batch = False

    def __init__(self, fn: Callable[..., Any]):
        self.fn = fn

    def run_inlined(self, input_map: dict[str, Any], output: Any, params: dict[str, Any]) -> Any:
        return self.fn(input_map, output, params)

    def run(self, inputs: dict[str, DataFrame], ctx: ComputeContext) -> Optional[DataFrame]:
        return None  # inlined slots do not produce the output DataFrame


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
