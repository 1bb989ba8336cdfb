"""Constraint merge lattice — the semantics of merge_json.pl.

The reference merges partial JSON-Schema fragments pairwise in arbitrary
order (CHR fires opportunistically), so the merge MUST be associative and
commutative (comment at /root/reference/lib-pl/merge_json.pl:73-75). The
facet lattice (merge_facet/4, merge_json.pl:143-157):

    minLength -> max(A,B)        tightest lower bound wins
    maxLength -> min(A,B)        tightest upper bound wins
    minimum   -> max(A,B)
    maximum   -> min(A,B)
    pattern   -> '(A|B)'         OR-composition (W3C multi-pattern rule)
    exclusiveMinimum/Maximum     must agree (else conflict)

plus merge_json/3: enum and required merge by SET UNION (merge_json.pl:
76-78), descriptions concatenate (:55-61), lists append (:106-108).

Occurrence arithmetic: sum_occurs/3 (xsd2json.pl:986-1006) — ``unbounded``
(None) is absorbing: None + x = None.
"""

from __future__ import annotations

from typing import Optional

from xsd2json_spark.spec.constraints import (
    Cardinality,
    Constraint,
    Enum,
    Length,
    Pattern,
    Range,
    Spec,
    SpecError,
)


def sum_occurs(a: Optional[int], b: Optional[int]) -> Optional[int]:
    """Saturating occurrence addition (xsd2json.pl:986-1006):
    unbounded (None) absorbs."""
    if a is None or b is None:
        return None
    return a + b


def merge_range(a: Range, b: Range) -> Range:
    """Tightest-bound resolution. On an equal bound, exclusive (strict)
    is the tighter reading, mirroring draft-04's boolean flag."""
    if a.column != b.column or a.expr != b.expr:
        raise SpecError(f"cannot merge ranges over different columns: {a.id} vs {b.id}")
    lo, lo_ex = a.min, a.exclusive_min
    if b.min is not None and (lo is None or b.min > lo or (b.min == lo and b.exclusive_min)):
        lo, lo_ex = b.min, b.exclusive_min
    hi, hi_ex = a.max, a.exclusive_max
    if b.max is not None and (hi is None or b.max < hi or (b.max == hi and b.exclusive_max)):
        hi, hi_ex = b.max, b.exclusive_max
    if lo is not None and hi is not None and lo > hi:
        raise SpecError(f"merged range {a.id}+{b.id} unsatisfiable: [{lo},{hi}]")
    return Range(id=a.id, column=a.column, min=lo, max=hi, exclusive_min=lo_ex, exclusive_max=hi_ex, expr=a.expr)


def merge_length(a: Length, b: Length) -> Length:
    if a.column != b.column:
        raise SpecError(f"cannot merge lengths over different columns: {a.id} vs {b.id}")

    def _max(x, y):
        return y if x is None else x if y is None else max(x, y)

    def _min(x, y):
        return y if x is None else x if y is None else min(x, y)

    lo, hi = _max(a.min, b.min), _min(a.max, b.max)
    if lo is not None and hi is not None and lo > hi:
        raise SpecError(f"merged length {a.id}+{b.id} unsatisfiable: [{lo},{hi}]")
    return Length(id=a.id, column=a.column, min=lo, max=hi)


def merge_pattern(a: Pattern, b: Pattern) -> Pattern:
    """'(A|B)' OR-composition (merge_json.pl:152; xsd2json.pl:1097-1116).
    Order-insensitive: dedupe + sort the alternatives."""
    if a.column != b.column:
        raise SpecError(f"cannot merge patterns over different columns: {a.id} vs {b.id}")
    pats = tuple(sorted(set(a.patterns) | set(b.patterns)))
    return Pattern(id=a.id, column=a.column, patterns=pats)


def merge_enum(a: Enum, b: Enum) -> Enum:
    """Set union (merge_json.pl:76-78), order-insensitive."""
    if a.column != b.column:
        raise SpecError(f"cannot merge enums over different columns: {a.id} vs {b.id}")
    vals = tuple(sorted(set(a.values) | set(b.values), key=repr))
    return Enum(id=a.id, column=a.column, values=vals)


def merge_cardinality(a: Cardinality, b: Cardinality) -> Cardinality:
    """Tightest bounds; None max = unbounded (absorbed by a finite max)."""
    if a.group_by != b.group_by:
        raise SpecError(f"cannot merge cardinality over different keys: {a.id} vs {b.id}")
    lo = max(x for x in (a.min, b.min) if x is not None) if (a.min is not None or b.min is not None) else None
    his = [x for x in (a.max, b.max) if x is not None]
    hi = min(his) if his else None
    if lo is not None and hi is not None and lo > hi:
        raise SpecError(f"merged cardinality {a.id}+{b.id} unsatisfiable: [{lo},{hi}]")
    return Cardinality(id=a.id, group_by=a.group_by, min=lo, max=hi)


_MERGERS = {
    Range: merge_range,
    Length: merge_length,
    Pattern: merge_pattern,
    Enum: merge_enum,
    Cardinality: merge_cardinality,
}


def merge_constraints(a: Constraint, b: Constraint) -> Constraint:
    """Merge two same-id constraints; AC by construction."""
    if type(a) is not type(b):
        raise SpecError(f"cannot merge {type(a).__name__} with {type(b).__name__} (id {a.id})")
    fn = _MERGERS.get(type(a))
    if fn is None:
        if a == b:  # idempotent kinds (NotNull, Dtype, Constant, FK, Unique, ...)
            return a
        raise SpecError(f"conflicting non-mergeable constraints for id {a.id}")
    return fn(a, b)


def compose_specs(*specs: Spec, name: Optional[str] = None) -> Spec:
    """xs:include / xs:import analog (xsd2json.pl:2079-2161): compose
    several spec files into one. Same-id constraints go through the merge
    lattice; distinct ids concatenate. Order-insensitive up to constraint
    ordering (result is sorted by id for determinism)."""
    if not specs:
        raise SpecError("compose_specs: nothing to compose")
    by_id: dict[str, Constraint] = {}
    for s in specs:
        for c in s.constraints:
            by_id[c.id] = merge_constraints(by_id[c.id], c) if c.id in by_id else c

    def _union(attr: str) -> tuple:
        seen: list = []
        for s in specs:
            for v in getattr(s, attr):
                if v not in seen:
                    seen.append(v)
        return tuple(seen)

    return Spec(
        name=name or specs[0].name,
        constraints=tuple(sorted(by_id.values(), key=lambda c: c.id)),
        key_columns=_union("key_columns"),
        partition_by=_union("partition_by"),
        watched_columns=_union("watched_columns"),
    )
