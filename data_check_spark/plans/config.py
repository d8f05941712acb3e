"""Declarative suite configuration — build a CheckSuite from a plain
JSON/dict spec, so a validation suite can live in version control next
to the pipeline it gates instead of in Python code.

The reference's configuration surface is a Streamlit form
(``/root/reference/data_check/streamlit_app.py``) producing an
in-memory request; production validation wants the opposite: a
reviewable text artifact (the deequ/Great-Expectations convention).
A config is a JSON object::

    {"checks": [
        {"kind": "stats", "thresholds": {"text": {"max_null_rate": 0.02}}},
        {"kind": "uniqueness", "key": "url"},
        {"kind": "fd", "determinant": "url", "dependents": ["text"]},
        {"kind": "expr", "name": "scheme", "predicate_sql": "url LIKE 'http%'"},
        {"kind": "numeric_drift", "name": "len", "expr": "length(text)",
         "lo": 0, "hi": 4096, "reference_path": "/path/v1.parquet"},
        {"kind": "referential", "name": "domains", "fact_key": "domain",
         "dim_path": "/path/domains.parquet", "dim_key": "domain"}
    ]}

Each entry's ``kind`` picks the check dataclass; the remaining keys
are its constructor fields, validated against the dataclass (unknown
keys raise with the valid-field list — a typo'd gate must not
silently vanish). Three bridges make the specs pure data:

  * ``expr`` fields that are Callable[[], Column] in code accept a
    SQL expression STRING in config (wrapped in ``F.expr``);
  * ``reference``/``dim`` frame loaders accept ``reference_path`` /
    ``dim_path`` parquet paths (wrapped in a reader closure);
  * list-typed tuple fields (``dependents``, ``exact_distinct``) are
    coerced.

Python-only constructions (a computed Column fact_key, an Iceberg
snapshot loader) stay available on the dataclasses themselves —
config covers the declarable subset, it doesn't replace the API.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from data_check_spark.plans.suite import (
    CategoricalDriftCheck,
    CheckSuite,
    CompareCheck,
    ExprCheck,
    FingerprintCheck,
    FunctionalDependencyCheck,
    KSDigestDriftCheck,
    KSDriftCheck,
    LineDupCheck,
    LMCheck,
    NearDupCheck,
    NumericDriftCheck,
    ProfileCheck,
    ReferentialCheck,
    RepetitionCheck,
    SchemaCheck,
    StatsCheck,
    UniquenessCheck,
)

_KINDS = {
    "stats": StatsCheck,
    "uniqueness": UniquenessCheck,
    "fd": FunctionalDependencyCheck,
    "referential": ReferentialCheck,
    "categorical_drift": CategoricalDriftCheck,
    "numeric_drift": NumericDriftCheck,
    "ks_drift": KSDriftCheck,
    "ks_digest_drift": KSDigestDriftCheck,
    "profile": ProfileCheck,
    "repetition": RepetitionCheck,
    "neardup": NearDupCheck,
    "linedup": LineDupCheck,
    "lm": LMCheck,
    "expr": ExprCheck,
    "schema": SchemaCheck,
    "fingerprint": FingerprintCheck,
    "compare": CompareCheck,
}

# config fields that wrap into Callable[[], Column]
_SQL_EXPR_KINDS = {"numeric_drift", "ks_drift", "ks_digest_drift"}
# config path fields → (dataclass field, reader closure)
_PATH_FIELDS = {"reference_path": "reference", "dim_path": "dim"}
_TUPLE_FIELDS = {"dependents", "exact_distinct"}


def _make_expr(sql: str):
    return lambda: F.expr(sql)


def _make_reader(path: str):
    return lambda spark: spark.read.parquet(path)


def check_from_spec(spec: dict):
    """One config entry → one check instance (validated)."""
    spec = dict(spec)
    kind = spec.pop("kind", None)
    if kind not in _KINDS:
        raise ValueError(
            f"unknown check kind {kind!r}; valid: {sorted(_KINDS)}"
        )
    cls = _KINDS[kind]
    fields = set(cls.__dataclass_fields__)
    if kind in _SQL_EXPR_KINDS and isinstance(spec.get("expr"), str):
        spec["expr"] = _make_expr(spec["expr"])
    for cfg_key, field in _PATH_FIELDS.items():
        if cfg_key in spec:
            if field not in fields:
                raise ValueError(f"{kind!r} takes no {cfg_key!r}")
            spec[field] = _make_reader(spec.pop(cfg_key))
    for k in _TUPLE_FIELDS & spec.keys():
        if isinstance(spec[k], list):
            spec[k] = tuple(spec[k])
    unknown = set(spec) - fields
    if unknown:
        raise ValueError(
            f"{kind!r} got unknown field(s) {sorted(unknown)}; "
            f"valid: {sorted(fields)}"
        )
    return cls(**spec)


def suite_from_config(cfg: dict | list) -> CheckSuite:
    """Build a CheckSuite from a parsed config (the ``{"checks":
    [...]}`` object, or the bare check list)."""
    checks = cfg["checks"] if isinstance(cfg, dict) else cfg
    if not checks:
        raise ValueError("config has no checks")
    return CheckSuite([check_from_spec(s) for s in checks])


def load_suite(path: str) -> CheckSuite:
    """Read a JSON config file and build its CheckSuite."""
    with open(path) as f:
        return suite_from_config(json.load(f))
