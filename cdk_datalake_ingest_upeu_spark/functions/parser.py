"""Nested-function-aware expression parser for column transform specs.

Grammar (reference semantics, ``light_transform.py:619-692``):

- ``fn_name(p1, p2, ...)`` — a function call; parameters may themselves
  be ``fn_transform_*`` calls (nesting), column names, or literals.
- anything else — a bare column reference.

Commas split parameters only at paren-depth 0 and outside double
quotes; backslash-escaped quotes don't toggle quoting.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class ParsedExpr:
    """A parsed transform expression node."""

    kind: str  # 'call' | 'column'
    name: str  # function name or column name
    params: list[str] = field(default_factory=list)


class ExpressionParser:
    _CALL_RE = re.compile(r"(\w+)\((.*)\)$")

    def parse(self, expression: str) -> ParsedExpr | None:
        """Parse one transform expression; None for blank specs."""
        if not expression or not expression.strip():
            return None
        text = expression.strip()
        m = self._CALL_RE.match(text)
        if not m:
            return ParsedExpr(kind="column", name=text)
        name, params_str = m.group(1), m.group(2)
        return ParsedExpr(kind="call", name=name, params=self.split_params(params_str))

    @staticmethod
    def split_params(params_str: str) -> list[str]:
        """Split a parameter list on root-level commas.

        Respects nested ``(...)`` and ``"..."`` regions the same way the
        reference's extractor does (``light_transform.py:650-692``).
        """
        if not params_str:
            return []
        params: list[str] = []
        current: list[str] = []
        depth = 0
        in_quotes = False
        for i, ch in enumerate(params_str):
            if ch == '"' and (i == 0 or params_str[i - 1] != "\\"):
                in_quotes = not in_quotes
                current.append(ch)
            elif ch == "(" and not in_quotes:
                depth += 1
                current.append(ch)
            elif ch == ")" and not in_quotes:
                depth -= 1
                current.append(ch)
            elif ch == "," and depth == 0 and not in_quotes:
                token = "".join(current).strip()
                if token:
                    params.append(token)
                current = []
            else:
                current.append(ch)
        token = "".join(current).strip()
        if token:
            params.append(token)
        return params


def split_projection_list(columns_str: str) -> list[str]:
    """Split a COLUMNS projection string on top-level commas.

    Used when the projection embeds source-SQL expressions containing
    commas (e.g. ``CONVERT(varchar, x, 120) AS x``). Quote handling uses
    single quotes, matching the SQL dialect of the projection
    (reference ``extract_data_spark.py:496-549``).
    """
    if not columns_str or not columns_str.strip():
        return []
    cols: list[str] = []
    current: list[str] = []
    depth = 0
    in_quotes = False
    for ch in columns_str:
        if ch == "'":
            in_quotes = not in_quotes
            current.append(ch)
        elif ch == "(" and not in_quotes:
            depth += 1
            current.append(ch)
        elif ch == ")" and not in_quotes:
            depth -= 1
            current.append(ch)
        elif ch == "," and depth == 0 and not in_quotes:
            token = "".join(current).strip()
            if token:
                cols.append(token)
            current = []
        else:
            current.append(ch)
    token = "".join(current).strip()
    if token:
        cols.append(token)
    return cols
