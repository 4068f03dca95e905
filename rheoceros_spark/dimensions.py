"""Dimension (partition) algebra — pure Python, no Spark dependency.

Re-expresses the reference's dimension model (reference
``src/intelliflow/core/signal_processing/dimension_constructs.py``,
~2700 LoC) as a lean algebra over **partition columns**:

* :class:`Dimension` / :class:`DimensionSpec` — ordered, typed
  partition attributes (reference ``dimension_constructs.py:38-221``).
* :class:`DimensionVariant` subclasses — concrete or special values of
  a dimension: ``AnyVariant`` (``"*"``, reference ``:921-976``),
  ``RelativeVariant`` (``"_:-N[:shift]"``, reference ``:979-1201``),
  ``StringVariant`` (``:1204-1300``), ``DateVariant`` (``:1519-1838``),
  ``LongVariant`` (``:1853-1873``).
* :class:`DimensionFilter` — a set of partition-value branches with
  ``chain`` (intersection / refinement, reference ``:2096-2227``) and
  ``apply_values`` (finalize: fold relative ranges into concrete
  partition values, reference ``:2087-2088``).

Spark mapping: a finalized filter is exactly a **partition predicate**
— the engine turns it into a concrete path list (partition pruning
before the scan) or a ``Column`` conjunction.  Chaining two filters is
predicate conjunction; a wildcard contributes no predicate.

Semantics preserved from the reference (SURVEY.md §7.3 traps):

* ``_:-N`` includes the datum — N values total (reference
  ``dimension_constructs.py:1133-1142``).
* shift ``_:-N:S`` moves the anchor *before* expansion (``:565-578``).
* ``chain`` returns ``None`` on spec (breadth/type) mismatch but an
  **empty filter** on value mismatch (``:2169-2173``).
* date arithmetic respects granularity (``:1751-1793``); parsing is
  fuzzy via ``dateutil`` with strptime fallback (``:1522-1568``).
"""

from __future__ import annotations

import re
from datetime import date, datetime, timedelta
from enum import Enum
from itertools import product
from typing import Any, Callable, Iterable, Optional, Sequence, Union

try:  # fuzzy date parsing parity (reference dimension_constructs.py:1522-1568)
    from dateutil import parser as _dateutil_parser
    from dateutil.relativedelta import relativedelta as _relativedelta
except ImportError:  # pragma: no cover - dateutil ships with pandas
    _dateutil_parser = None
    _relativedelta = None

ANY = "*"

# Cap on values a single relative range may expand to (reference
# MAX_RANGE_LIMIT, dimension_constructs.py:822).
MAX_RANGE_LIMIT = 9999


class DimensionType(str, Enum):
    """Reference supports exactly these three (dimension_defs.py:12-17)."""

    STRING = "STRING"
    LONG = "LONG"
    DATETIME = "DATETIME"


class DatetimeGranularity(str, Enum):
    """Reference dimension_defs.py:50-57."""

    MINUTE = "MINUTE"
    HOUR = "HOUR"
    DAY = "DAY"
    WEEK = "WEEK"
    MONTH = "MONTH"
    YEAR = "YEAR"


class Dimension:
    """A named, typed partition attribute (reference dimension_constructs.py:38-148).

    ``params`` carries the per-type options: ``format`` (strftime for
    DATETIME, callable for STRING), ``granularity``, ``digits``,
    ``insensitive``, ``min``.
    """

    def __init__(self, name: str, type: DimensionType = DimensionType.STRING, params: Optional[dict] = None):
        self.name = name
        self.type = DimensionType(type)
        self.params = dict(params or {})

    @property
    def granularity(self) -> DatetimeGranularity:
        return DatetimeGranularity(self.params.get("granularity", DatetimeGranularity.DAY))

    @property
    def format(self):
        return self.params.get("format")

    def __repr__(self) -> str:
        return f"Dimension({self.name!r}, {self.type.value})"

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Dimension) and self.name == other.name and self.type == other.type

    def __hash__(self) -> int:
        return hash((self.name, self.type))


class DimensionSpec:
    """Ordered list of Dimensions = the partition-column order.

    The reference models this as a nested tree (one branch per
    dimension chain, ``dimension_constructs.py:173-221``); every usage
    in its test/application corpus is a single chain, which is exactly
    an ordered list — the natural Spark shape (``partitionBy(d1, d2)``).
    """

    def __init__(self, dimensions: Sequence[Dimension] = ()):
        self.dimensions: list[Dimension] = list(dimensions)

    @classmethod
    def load(cls, raw: dict[str, Any]) -> "DimensionSpec":
        """From ``{name: {type: ..., [format/granularity/...]}}`` (insertion-ordered)."""
        dims = []
        for name, params in raw.items():
            params = dict(params or {})
            typ = DimensionType(params.pop("type", DimensionType.STRING))
            dims.append(Dimension(name, typ, params))
        return cls(dims)

    def dimension_names(self) -> list[str]:
        return [d.name for d in self.dimensions]

    def find(self, name: str) -> Optional[Dimension]:
        for d in self.dimensions:
            if d.name == name:
                return d
        return None

    def compatible_with(self, other: "DimensionSpec") -> bool:
        """Structural (breadth + type) compatibility (reference :296-388, 2229-2259)."""
        return len(self.dimensions) == len(other.dimensions) and all(
            a.type == b.type for a, b in zip(self.dimensions, other.dimensions)
        )

    def __len__(self) -> int:
        return len(self.dimensions)

    def __iter__(self):
        return iter(self.dimensions)

    def __repr__(self) -> str:
        return f"DimensionSpec({self.dimensions!r})"


# ---------------------------------------------------------------------------
# Variants
# ---------------------------------------------------------------------------

_RELATIVE_RE = re.compile(r"^_:(-?\d+)(?::(-?\d+))?$")


class DimensionVariant:
    """A value of a dimension — concrete, or special (reference :507-662)."""

    is_material = True  # AnyVariant / RelativeVariant override to False

    def __init__(self, value: Any, dim: Optional[Dimension] = None):
        self.value = value
        self.dim = dim or Dimension("dim", DimensionType.STRING)

    # -- intersection (the heart of filter chaining) --------------------
    def intersect(self, other: "DimensionVariant") -> Optional[list["DimensionVariant"]]:
        """Return the refined variant list for ``self ∩ other``; None if disjoint.

        Mirrors the reference's polymorphic both-direction ``apply``
        retry (``dimension_constructs.py:587-627``): callers try
        ``a.intersect(b)`` then ``b.intersect(a)``.
        """
        if isinstance(other, AnyVariant):
            return [self]
        if self._eq_value(other):
            return [self]
        return None

    def _eq_value(self, other: "DimensionVariant") -> bool:
        return _values_equal(self, other)

    # -- rendering -------------------------------------------------------
    def raw(self) -> Any:
        return self.value

    def formatted(self) -> str:
        return str(self.value)

    def __repr__(self) -> str:
        return f"{type(self).__name__}({self.value!r})"


class AnyVariant(DimensionVariant):
    """Wildcard ``"*"`` — matches everything, contributes no predicate
    (reference dimension_constructs.py:921-976)."""

    is_material = False

    def __init__(self, dim: Optional[Dimension] = None):
        super().__init__(ANY, dim)

    def intersect(self, other: DimensionVariant) -> Optional[list[DimensionVariant]]:
        return [other]

    def formatted(self) -> str:
        return ANY


class RelativeVariant(DimensionVariant):
    """``_:-N[:shift]`` — a relative range of N values anchored at a
    runtime datum (reference dimension_constructs.py:979-1201).

    ``relative_index=-N`` expands to N values *including the datum*
    (``:1133-1142``); ``shift`` moves the anchor before expansion
    (``:565-578``).  Non-material until a datum is applied.
    """

    is_material = False

    def __init__(self, relative_index: int, shift: int = 0, dim: Optional[Dimension] = None):
        if abs(relative_index) > MAX_RANGE_LIMIT:
            raise ValueError(f"relative range exceeds MAX_RANGE_LIMIT={MAX_RANGE_LIMIT}")
        super().__init__(f"_:{relative_index}" + (f":{shift}" if shift else ""), dim)
        self.relative_index = relative_index
        self.shift = shift

    @classmethod
    def parse(cls, raw: str, dim: Optional[Dimension] = None) -> Optional["RelativeVariant"]:
        m = _RELATIVE_RE.match(raw)
        if not m:
            return None
        return cls(int(m.group(1)), int(m.group(2) or 0), dim)

    def intersect(self, other: DimensionVariant) -> Optional[list[DimensionVariant]]:
        if isinstance(other, AnyVariant):
            return [self]
        if isinstance(other, RelativeVariant):
            # range ∩ range → the narrower range (reference :1067-1108)
            idx = self.relative_index if abs(self.relative_index) <= abs(other.relative_index) else other.relative_index
            return [RelativeVariant(idx, self.shift or other.shift, self.dim)]
        # concrete datum applied to a declared relative → anchored range
        return [AnchoredRangeVariant(other, self.relative_index, self.shift, other.dim or self.dim)]

    def expand(self, datum: DimensionVariant) -> list[DimensionVariant]:
        return AnchoredRangeVariant(datum, self.relative_index, self.shift, datum.dim).expand()


class AnchoredRangeVariant(DimensionVariant):
    """A relative range whose anchor is known — expands to concrete
    values at finalize time, newest (TIP) first."""

    is_material = False

    def __init__(self, anchor: DimensionVariant, relative_index: int, shift: int = 0, dim: Optional[Dimension] = None):
        super().__init__(anchor.value, dim or anchor.dim)
        self.anchor = anchor
        self.relative_index = relative_index
        self.shift = shift

    def expand(self) -> list[DimensionVariant]:
        n = abs(self.relative_index) or 1
        step = -1 if self.relative_index <= 0 else 1
        anchor = self.anchor
        if self.shift:
            anchor = _step_variant(anchor, self.shift)
        out = [anchor]
        cur = anchor
        for _ in range(n - 1):
            cur = _step_variant(cur, step)
            out.append(cur)
        return out  # TIP first (reference orders ranges most-recent first)


class StringVariant(DimensionVariant):
    """STRING value; params ``format`` (callable) and ``insensitive``
    (reference dimension_constructs.py:1204-1300)."""

    def __init__(self, value: str, dim: Optional[Dimension] = None):
        dim = dim or Dimension("dim", DimensionType.STRING)
        fmt: Optional[Callable[[str], str]] = dim.params.get("format")
        value = str(value)
        if fmt:
            value = fmt(value)
        super().__init__(value, dim)

    @property
    def insensitive(self) -> bool:
        return bool(self.dim.params.get("insensitive"))

    def _eq_value(self, other: DimensionVariant) -> bool:
        a, b = str(self.value), str(other.value)
        if self.insensitive or bool(getattr(other, "insensitive", False)):
            return a.lower() == b.lower()
        return a == b


class LongVariant(DimensionVariant):
    """LONG value; param ``digits`` → zero-padded rendering
    (reference dimension_constructs.py:1853-1873)."""

    def __init__(self, value: Union[int, str], dim: Optional[Dimension] = None):
        super().__init__(int(value), dim or Dimension("dim", DimensionType.LONG))

    def formatted(self) -> str:
        digits = self.dim.params.get("digits")
        return str(self.value).zfill(int(digits)) if digits else str(self.value)


class DateVariant(DimensionVariant):
    """DATETIME value; params ``format`` (strftime), ``granularity``,
    ``min`` (reference dimension_constructs.py:1519-1838)."""

    def __init__(self, value: Union[str, datetime, date], dim: Optional[Dimension] = None):
        dim = dim or Dimension("dim", DimensionType.DATETIME)
        dt = _parse_datetime(value, dim.params.get("format"))
        if dt is None:
            raise ValueError(f"cannot parse datetime from {value!r}")
        super().__init__(dt, dim)
        min_guard = dim.params.get("min")
        if min_guard is not None:
            min_dt = _parse_datetime(min_guard, dim.params.get("format"))
            if min_dt is not None and dt < min_dt:
                raise ValueError(f"datetime {dt} below min guard {min_dt}")

    def _eq_value(self, other: DimensionVariant) -> bool:
        odt = other.value if isinstance(other.value, datetime) else _parse_datetime(other.value, self.dim.params.get("format"))
        if odt is None:
            return False
        g = self.dim.granularity
        return _truncate(self.value, g) == _truncate(odt, g)

    def formatted(self) -> str:
        fmt = self.dim.params.get("format") or _DEFAULT_DATE_FORMAT[self.dim.granularity]
        return self.value.strftime(fmt)


_DEFAULT_DATE_FORMAT = {
    DatetimeGranularity.MINUTE: "%Y-%m-%d %H:%M",
    DatetimeGranularity.HOUR: "%Y-%m-%d %H",
    DatetimeGranularity.DAY: "%Y-%m-%d",
    DatetimeGranularity.WEEK: "%Y-%m-%d",
    DatetimeGranularity.MONTH: "%Y-%m",
    DatetimeGranularity.YEAR: "%Y",
}


def _truncate(dt: datetime, g: DatetimeGranularity) -> datetime:
    if g == DatetimeGranularity.MINUTE:
        return dt.replace(second=0, microsecond=0)
    if g == DatetimeGranularity.HOUR:
        return dt.replace(minute=0, second=0, microsecond=0)
    if g == DatetimeGranularity.DAY:
        return dt.replace(hour=0, minute=0, second=0, microsecond=0)
    if g == DatetimeGranularity.WEEK:
        day = dt.replace(hour=0, minute=0, second=0, microsecond=0)
        return day - timedelta(days=day.weekday())
    if g == DatetimeGranularity.MONTH:
        return dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    return dt.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)


def _parse_datetime(value: Any, fmt: Optional[str] = None) -> Optional[datetime]:
    """strptime-with-format first, then fuzzy dateutil fallback
    (order per reference resolver, dimension_constructs.py:1795-1838)."""
    if isinstance(value, datetime):
        return value
    if isinstance(value, date):
        return datetime(value.year, value.month, value.day)
    s = str(value)
    if fmt:
        try:
            return datetime.strptime(s, fmt)
        except ValueError:
            pass
    if _dateutil_parser is not None:
        try:
            return _dateutil_parser.parse(s)
        except (ValueError, OverflowError):
            pass
    for f in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d %H:%M", "%Y-%m-%d", "%Y%m%d", "%Y-%m", "%Y"):
        try:
            return datetime.strptime(s, f)
        except ValueError:
            continue
    return None


def _step_variant(v: DimensionVariant, step: int) -> DimensionVariant:
    """One granularity step (+/-) — reference date arithmetic respects
    granularity via timedelta/relativedelta (dimension_constructs.py:1751-1793)."""
    if isinstance(v, DateVariant):
        g = v.dim.granularity
        dt = v.value
        if g == DatetimeGranularity.MINUTE:
            nd = dt + timedelta(minutes=step)
        elif g == DatetimeGranularity.HOUR:
            nd = dt + timedelta(hours=step)
        elif g == DatetimeGranularity.DAY:
            nd = dt + timedelta(days=step)
        elif g == DatetimeGranularity.WEEK:
            nd = dt + timedelta(weeks=step)
        elif g == DatetimeGranularity.MONTH:
            nd = dt + _relativedelta(months=step) if _relativedelta else _add_months(dt, step)
        else:
            nd = dt + _relativedelta(years=step) if _relativedelta else _add_months(dt, 12 * step)
        return DateVariant(nd, v.dim)
    if isinstance(v, LongVariant):
        return LongVariant(v.value + step, v.dim)
    raise TypeError(f"relative range not supported for {type(v).__name__} (STRING dims have no order)")


def _add_months(dt: datetime, months: int) -> datetime:  # pragma: no cover - relativedelta present
    m = dt.month - 1 + months
    y, m = dt.year + m // 12, m % 12 + 1
    import calendar

    return dt.replace(year=y, month=m, day=min(dt.day, calendar.monthrange(y, m)[1]))


def _values_equal(a: DimensionVariant, b: DimensionVariant) -> bool:
    if isinstance(a, DateVariant):
        return a._eq_value(b)
    if isinstance(b, DateVariant):
        return b._eq_value(a)
    if isinstance(a, LongVariant) or isinstance(b, LongVariant):
        try:
            return int(a.value) == int(b.value)
        except (TypeError, ValueError):
            return False
    if isinstance(a, StringVariant):
        return a._eq_value(b)
    if isinstance(b, StringVariant):
        return b._eq_value(a)
    return a.value == b.value


def create_variant(value: Any, dim: Optional[Dimension] = None) -> DimensionVariant:
    """Type-inferring factory (reference ``DimensionVariantFactory.create_variant``,
    dimension_constructs.py:807-918): explicit dim type wins, else
    resolvers score the raw value (special > long > datetime > string)."""
    if isinstance(value, DimensionVariant):
        return value
    if isinstance(value, str):
        if value == ANY:
            return AnyVariant(dim)
        rel = RelativeVariant.parse(value, dim)
        if rel is not None:
            return rel
    if dim is not None:
        if dim.type == DimensionType.LONG:
            return LongVariant(value, dim)
        if dim.type == DimensionType.DATETIME:
            return DateVariant(value, dim)
        return StringVariant(value, dim)
    # no declared dim → infer
    if isinstance(value, bool):
        return StringVariant(str(value))
    if isinstance(value, int):
        return LongVariant(value)
    if isinstance(value, (datetime, date)):
        return DateVariant(value)
    s = str(value)
    if re.fullmatch(r"-?\d+", s) and not re.fullmatch(r"\d{8}", s):
        return LongVariant(int(s))
    looks_dateish = re.fullmatch(r"\d{8}", s) or (re.search(r"\d", s) and len(s) >= 4 and any(c in s for c in "-/:T"))
    if looks_dateish:
        dt = _parse_datetime(s)
        if dt is not None:
            return DateVariant(dt)
    return StringVariant(s)


# ---------------------------------------------------------------------------
# Filter
# ---------------------------------------------------------------------------

Branch = tuple  # tuple[DimensionVariant, ...] aligned to spec order


class DimensionFilter:
    """A set of partition-value **branches** over a DimensionSpec.

    The reference stores this as a nested variant tree
    (``dimension_constructs.py:2002-2259``); a branch list is the
    flattened equivalent and maps directly to Spark partition
    predicates: each branch is a conjunction, the branch set a
    disjunction.
    """

    def __init__(self, spec: DimensionSpec, branches: Iterable[Branch] = ()):
        self.spec = spec
        self.branches: list[Branch] = [tuple(b) for b in branches]

    # -- construction ----------------------------------------------------
    @classmethod
    def all_pass(cls, spec: DimensionSpec) -> "DimensionFilter":
        return cls(spec, [tuple(AnyVariant(d) for d in spec)])

    @classmethod
    def load_raw(cls, spec: DimensionSpec, raw: Any) -> "DimensionFilter":
        """From nested dicts/lists mirroring the reference's raw filter
        shape: ``{"NA": {"2020-05-01": {}}, "EU": {...}}`` or a flat
        list of per-dimension values ``["NA", "2020-05-01"]``.
        Lists at a level = multiple sibling values (branch fan-out).
        """
        if raw is None:
            return cls.all_pass(spec)
        if isinstance(raw, (list, tuple)) and not isinstance(raw, str):
            # flat per-dimension values, each possibly a list
            levels: list[list[DimensionVariant]] = []
            for dim, v in zip(spec, raw):
                vals = v if isinstance(v, (list, tuple)) and not isinstance(v, str) else [v]
                levels.append([create_variant(x, dim) for x in vals])
            for dim in list(spec)[len(levels):]:
                levels.append([AnyVariant(dim)])
            return cls(spec, [tuple(b) for b in product(*levels)])
        branches: list[Branch] = []

        def walk(node: Any, depth: int, prefix: list[DimensionVariant]) -> None:
            dims = list(spec)
            if depth >= len(dims) or not node:
                rest = [AnyVariant(d) for d in dims[depth:]]
                branches.append(tuple(prefix + rest))
                return
            for key, child in node.items():
                walk(child, depth + 1, prefix + [create_variant(key, dims[depth])])

        walk(raw, 0, [])
        return cls(spec, branches)

    # -- algebra ----------------------------------------------------------
    def chain(self, other: "DimensionFilter") -> Optional["DimensionFilter"]:
        """Intersection / refinement.  ``None`` on spec mismatch, empty
        filter on value mismatch (reference :2169-2173 — callers
        distinguish these)."""
        if not self.spec.compatible_with(other.spec):
            return None
        out: list[Branch] = []
        for a in self.branches:
            for b in other.branches:
                nb = _intersect_branches(a, b)
                if nb is not None:
                    out.extend(nb)
        return DimensionFilter(self.spec, _dedup_branches(out))

    def merge(self, other: "DimensionFilter") -> Optional["DimensionFilter"]:
        """Union (predicate OR): the branch sets combined.  The
        reference declares this but left it a stub
        (``dimension_constructs.py:2083-2085``); the branch-list
        representation makes it a dedup'd concatenation.  ``None`` on
        spec mismatch, mirroring :meth:`chain`."""
        if not self.spec.compatible_with(other.spec):
            return None
        return DimensionFilter(self.spec, _dedup_branches(list(self.branches) + list(other.branches)))

    def apply_values(self, values: Sequence[Any]) -> "DimensionFilter":
        """Finalize against runtime event values: chain with the
        material values, then expand relative variants into concrete
        ranges (reference ``apply``, :2087-2088; F2 in SURVEY §2.2)."""
        material = DimensionFilter.load_raw(self.spec, list(values))
        chained = self.chain(material)
        if chained is None:
            raise ValueError(f"values {values!r} incompatible with spec {self.spec!r}")
        return chained.finalize()

    def finalize(self) -> "DimensionFilter":
        """Expand anchored ranges → concrete branches, TIP first."""
        out: list[Branch] = []
        for branch in self.branches:
            levels: list[list[DimensionVariant]] = []
            for v in branch:
                if isinstance(v, AnchoredRangeVariant):
                    levels.append(v.expand())
                else:
                    levels.append([v])
            out.extend(tuple(b) for b in product(*levels))
        return DimensionFilter(self.spec, _dedup_branches(out))

    @property
    def is_material(self) -> bool:
        return all(v.is_material for b in self.branches for v in b)

    def values(self) -> list[tuple]:
        """Concrete value tuples, branch order preserved (TIP first for ranges)."""
        return [tuple(v.raw() for v in b) for b in self.branches]

    def formatted_values(self) -> list[tuple[str, ...]]:
        return [tuple(v.formatted() for v in b) for b in self.branches]

    def tip(self) -> Optional[tuple]:
        return self.values()[0] if self.branches else None

    # -- Spark / SQL compilation -----------------------------------------
    def to_sql_predicate(self, col_names: Optional[Sequence[str]] = None) -> str:
        """Render as an ANSI-SQL predicate over the partition columns —
        wildcard contributes no predicate (TRUE)."""
        cols = list(col_names or self.spec.dimension_names())
        disjuncts = []
        for b in self.branches:
            conjuncts = []
            for dim, col, v in zip(self.spec, cols, b):
                if not v.is_material:
                    continue
                if dim.type == DimensionType.LONG:
                    conjuncts.append(f"{col} = {int(v.value)}")
                else:
                    conjuncts.append(f"{col} = '{v.formatted()}'")
            disjuncts.append(" AND ".join(conjuncts) if conjuncts else "TRUE")
        if not disjuncts:
            return "FALSE"
        if "TRUE" in disjuncts:
            return "TRUE"
        uniq = sorted(set(disjuncts))
        if len(uniq) == 1:
            return uniq[0]
        return "(" + ") OR (".join(uniq) + ")"

    def __len__(self) -> int:
        return len(self.branches)

    def __repr__(self) -> str:
        return f"DimensionFilter({self.formatted_values()!r})"


def _intersect_branches(a: Branch, b: Branch) -> Optional[list[Branch]]:
    """Positionwise variant intersection with both-direction retry
    (reference dimension_constructs.py:587-627)."""
    levels: list[list[DimensionVariant]] = []
    for va, vb in zip(a, b):
        r = va.intersect(vb)
        if r is None:
            r = vb.intersect(va)
        if r is None:
            return None  # value mismatch → this branch pair contributes nothing
        levels.append(r)
    return [tuple(x) for x in product(*levels)]


def _dedup_branches(branches: list[Branch]) -> list[Branch]:
    seen: set = set()
    out: list[Branch] = []
    for b in branches:
        key = tuple((type(v).__name__, str(v.value)) for v in b)
        if key not in seen:
            seen.add(key)
            out.append(b)
    return out
