"""Named-query registry: the single source of truth behind
``__spark_entry__.py``'s ``queries()`` / ``oracle_sql()`` contract.

Each operator from SURVEY.md §2 registers here with a Spark callable
``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) the
equivalent DuckDB oracle SQL. Column names are aliased identically on
both sides because the driver's comparison sorts columns by name
before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: SparkQuery
    # DuckDB SQL; None → driver does rows-only check.  A zero-arg
    # callable is resolved lazily at oracle_sql() time — used by the
    # ANN serving-path oracles, whose SQL embeds the FITTED model
    # (centroids / codebooks) as literal tables read from the committed
    # sidecar under .models/ (VERDICT r8 next-round #1).
    oracle: "str | Callable[[], str] | None"
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)

    def oracle_text(self) -> str | None:
        """The oracle SQL with lazy callables resolved."""
        return self.oracle() if callable(self.oracle) else self.oracle


_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: "str | Callable[[], str] | None" = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: ``@register("q_name", oracle="SELECT ...")``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name=name, spark_fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


def _ensure_loaded() -> None:
    # Import for side effect: query modules self-register on import.
    from tda596_lab02mapreduce_spark import queries as _  # noqa: F401


def get(name: str) -> Query:
    _ensure_loaded()
    return _REGISTRY[name]


def all_queries() -> dict[str, SparkQuery]:
    _ensure_loaded()
    return {name: q.spark_fn for name, q in sorted(_REGISTRY.items())}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {
        name: q.oracle_text()
        for name, q in sorted(_REGISTRY.items())
        if q.oracle is not None
    }


def registry() -> dict[str, Query]:
    _ensure_loaded()
    return dict(sorted(_REGISTRY.items()))
