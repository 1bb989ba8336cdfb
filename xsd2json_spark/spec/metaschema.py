"""Meta-validation of compiled output against the JSON Schema draft-04
meta-schema — the reference validates every golden this way
(test/index.js:115-141, `npm run test-examples`); we apply the same
check to OUR compiler's output for any input, not just fixtures.

Primary path: the `jsonschema` package's bundled draft-04 meta-schema
(offline). Fallback: a structural keyword check covering the keywords
the compiler can emit, so the validator works without jsonschema too.
"""

from __future__ import annotations

from typing import List

_TYPES = {"array", "boolean", "integer", "null", "number", "object", "string"}


def validate_draft04(schema: dict) -> List[str]:
    """Validate `schema` against the draft-04 meta-schema. Returns a
    list of error strings — empty means valid."""
    try:
        from jsonschema import Draft4Validator
    except ImportError:  # pragma: no cover - jsonschema present in CI env
        return _structural_errors(schema, "$")
    validator = Draft4Validator(Draft4Validator.META_SCHEMA)
    return [
        "/".join(map(str, err.absolute_path)) + f": {err.message}"
        for err in validator.iter_errors(schema)
    ]


def assert_draft04(schema: dict) -> None:
    errors = validate_draft04(schema)
    if errors:
        raise ValueError("not a valid draft-04 schema:\n" + "\n".join(errors[:10]))


# -- fallback structural check (subset of the meta-schema) -----------------


def _structural_errors(node, path: str) -> List[str]:
    errs: List[str] = []
    if not isinstance(node, dict):
        return [f"{path}: schema must be an object"]
    t = node.get("type")
    if t is not None:
        ts = t if isinstance(t, list) else [t]
        for x in ts:
            if x not in _TYPES:
                errs.append(f"{path}/type: {x!r} is not a draft-04 type")
    for kw in ("required", "enum"):
        if kw in node and (not isinstance(node[kw], list) or not node[kw]):
            errs.append(f"{path}/{kw}: must be a non-empty array")
    for kw in ("allOf", "anyOf", "oneOf"):
        if kw in node:
            if not isinstance(node[kw], list) or not node[kw]:
                errs.append(f"{path}/{kw}: must be a non-empty array")
            else:
                for i, sub in enumerate(node[kw]):
                    errs += _structural_errors(sub, f"{path}/{kw}[{i}]")
    for kw in ("properties", "definitions", "patternProperties"):
        if kw in node:
            if not isinstance(node[kw], dict):
                errs.append(f"{path}/{kw}: must be an object")
            else:
                for k, sub in node[kw].items():
                    errs += _structural_errors(sub, f"{path}/{kw}/{k}")
    if "items" in node and isinstance(node["items"], dict):
        errs += _structural_errors(node["items"], f"{path}/items")
    for kw in ("minLength", "maxLength", "minItems", "maxItems", "minProperties"):
        if kw in node and (not isinstance(node[kw], int) or node[kw] < 0):
            errs.append(f"{path}/{kw}: must be a non-negative integer")
    for kw in ("exclusiveMinimum", "exclusiveMaximum"):
        if kw in node and not isinstance(node[kw], bool):
            errs.append(f"{path}/{kw}: draft-04 requires a boolean")
    if "pattern" in node and not isinstance(node["pattern"], str):
        errs.append(f"{path}/pattern: must be a string")
    if "$ref" in node and not isinstance(node["$ref"], str):
        errs.append(f"{path}/$ref: must be a string")
    return errs
