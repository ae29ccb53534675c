"""SimpleFilter: typed comparison predicates compiled from strings.

Parity with the reference's ``SimpleFilter`` / ``FilterParser``
(/root/reference/src/ConveyorBelt.Tooling/Internal/SimpleFilter.cs:18-168):
an expression string ``"Field op value"`` with ops ``> < >= <= != ==``,
where ``|`` separates OR'd alternatives
(DiagnosticsSourceSummary.cs:35-39).  The reference only ever
constructed these in tests; here they are a REAL pushed-down predicate:
compiled to a ``pyarrow.dataset`` expression handed to
``ray.data.read_parquet(filter=...)`` so row groups are pruned at the
read (SURVEY.md §2.3 F1).
"""

from __future__ import annotations

import re

import pyarrow.dataset as pads

# Reference validity rules (SimpleFilter.cs:12-21 + ParseExpression):
# operators are SPACE-DELIMITED (" > ", not ">") and an expression
# containing more than one distinct operator symbol is invalid.
_SPACED_OPS = (" >= ", " <= ", " != ", " == ", " > ", " < ")


def _parse_clause(alt: str) -> tuple[str, str, str]:
    """One ``"Field op value"`` clause -> (field, op, raw_value);
    raises ValueError on the reference's invalid shapes."""
    symbols = [s for s in _SPACED_OPS if s in alt]
    if len(symbols) != 1:
        raise ValueError(f"bad filter clause: {alt!r}")
    op = symbols[0]
    field, raw = alt.split(op, 1)
    field, raw = field.strip(), raw.strip()
    if not re.fullmatch(r"\w+", field) or not raw:
        raise ValueError(f"bad filter clause: {alt!r}")
    return field, op.strip(), raw


def _parse_value(raw: str):
    raw = raw.strip()
    if (raw.startswith("'") and raw.endswith("'")) or (
        raw.startswith('"') and raw.endswith('"')
    ):
        return raw[1:-1]
    low = raw.lower()
    if low == "true":
        return True
    if low == "false":
        return False
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw)
    except ValueError:
        pass
    return raw  # bare string (the reference tries typed parses then string)


def compile_filter(expr: str) -> pads.Expression:
    """``"a > 3 | b == 'x'"`` -> pyarrow dataset expression (OR of comparisons)."""
    alts = [a for a in expr.split("|") if a.strip()]
    if not alts:
        raise ValueError(f"empty filter expression: {expr!r}")
    out = None
    for alt in alts:
        field, op, raw = _parse_clause(alt)
        val = _parse_value(raw)
        f = pads.field(field)
        clause = {
            ">": f > val,
            "<": f < val,
            ">=": f >= val,
            "<=": f <= val,
            "==": f == val,
            "!=": f != val,
        }[op]
        out = clause if out is None else (out | clause)
    return out


def to_sql(expr: str) -> str:
    """Same expression as an ANSI-SQL predicate (for the DuckDB oracle)."""
    parts = []
    for alt in expr.split("|"):
        if not alt.strip():
            continue
        field, op, raw = _parse_clause(alt)
        val = _parse_value(raw)
        sql_op = {"==": "=", "!=": "<>"}.get(op, op)
        lit = f"'{val}'" if isinstance(val, str) else str(val)
        parts.append(f"{field} {sql_op} {lit}")
    return "(" + " OR ".join(parts) + ")"
