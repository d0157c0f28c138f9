"""Canonical JSON serialization — the K1 operator.

The reference canonicalizes a record ``_id`` before key generation and
manifest writing: object ids get their entries sorted by key
(case-sensitive) and re-serialized; primitive (string/number) ids are first
wrapped as ``{"id": "<value>"}`` (reference:
app/batch/MessageUtils.kt:79-112 ``getId``, :127-140 ``sortJsonByKey``).

Format choice: the reference's Klaxon serializer emits spaced JSON
(``{"k" : "v"}``); SURVEY.md §7.4.2 directs us to pick ONE canonical form
and use it consistently across key-gen and manifest. We use compact
separators (``{"k":"v"}``) — internally consistent, and identical to what
Spark's ``to_json`` and DuckDB's ``json_object`` emit, which keeps the
DuckDB oracle expressible.
"""

from __future__ import annotations

import json
import re
from typing import Any

_SEPARATORS = (",", ":")

# Strings json.dumps(ensure_ascii=False) emits verbatim: everything
# except the two escaped characters (" and \) and the control range
# below 0x20 (DEL and non-ASCII pass through unescaped). A flat dict of
# such strings serializes by concatenation — the fast path below, worth
# ~6x on the id-canonicalization hot path inside the normalization UDF
# (r14 opt round), output byte-identical by construction.
_NEEDS_ESCAPE = re.compile(r'[\x00-\x1f"\\]')


def canonical_json(value: Any) -> str:
    """Key-sorted compact JSON of any parsed JSON value (recursive)."""
    if type(value) is dict:
        parts = []
        for k in sorted(value):
            v = value[k]
            if (
                type(k) is str
                and type(v) is str
                and _NEEDS_ESCAPE.search(k) is None
                and _NEEDS_ESCAPE.search(v) is None
            ):
                parts.append(f'"{k}":"{v}"')
            else:
                break
        else:
            return "{" + ",".join(parts) + "}"
    return json.dumps(value, sort_keys=True, separators=_SEPARATORS, ensure_ascii=False)


def canonicalize_id(id_value: Any) -> str:
    """Canonical string form of a record id, per MessageUtils.getId.

    - dict  -> entries sorted by key, compact JSON
    - str   -> wrapped: {"id": "<s>"}
    - int/float/bool -> stringified then wrapped: {"id": "<v>"}
    - None / list -> "" (invalid id; caller skips the record,
      reference HBaseWriter.kt:408-409 and MessageUtils.kt:99-111)
    """
    if isinstance(id_value, dict):
        return canonical_json(id_value)
    if isinstance(id_value, str):
        return canonical_json({"id": id_value})
    if isinstance(id_value, bool):
        # bool before int: Python bool is an int subclass; reference treats
        # primitives uniformly by stringifying (lowercase true/false in JSON)
        return canonical_json({"id": "true" if id_value else "false"})
    if isinstance(id_value, (int, float)):
        return canonical_json({"id": _render_number(id_value)})
    return ""


def _render_number(n: int | float) -> str:
    """Render a JSON number the way Gson's JsonPrimitive.getAsString does
    for the realistic range: JSON ints stay ints, JSON floats keep their
    decimal point (MessageUtils.kt:94-98 stringifies the primitive id).

    DOCUMENTED DIVERGENCE (r10 review): floats that render in exponent
    form differ — Python repr gives '1e+20' where Java Double.toString
    gives '1.0E20'. A float id at that magnitude has already lost
    integer precision and no fixture or observed dump uses one; if such
    ids ever appear, key parity needs a Java-Double renderer here."""
    if isinstance(n, int):
        return str(n)
    return repr(n)
