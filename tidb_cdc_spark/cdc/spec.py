"""Table specs: the engine's schema registry.

Replaces the reference's reflection machinery — Go structs + gorm
tags resolved per event (``GetModelFields`` / ``GetColumnNameFromTag``
at ``/root/reference/cdc_utils.go:126-156`` and ``tag.go:9-22``) —
with a declarative spec resolved ONCE at registration time into
Catalyst expressions. Column-name resolution order matches the
reference (``cdc_utils.go:56-62``):

1. explicit ``column=`` override (gorm ``column:<name>`` tag);
2. else snake_case of the field name (gorm NamingStrategy).

Fields marked ``exclude`` replicate ``gorm:"-"``
(``cdc_utils.go:134``). Nested specs are flattened at build time,
replicating the embedded-struct flattening of
``cdc_utils.go:137-141``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


_SNAKE_RE_1 = re.compile(r"([A-Z]+)([A-Z][a-z])")
_SNAKE_RE_2 = re.compile(r"([a-z\d])([A-Z])")


def snake_case(name: str) -> str:
    """gorm ``NamingStrategy.ColumnName`` equivalent: CamelCase →
    snake_case, keeping acronym runs together (``EntityID`` →
    ``entity_id``, ``HTTPCode`` → ``http_code``)."""
    s = _SNAKE_RE_1.sub(r"\1_\2", name)
    s = _SNAKE_RE_2.sub(r"\1_\2", s)
    return s.lower()


#: Spark SQL type strings the spec accepts. Values are parsed from the
#: string-map phase with ``try_cast`` semantics (lenient decode,
#: matching the reference's recover-per-field at cdc_utils.go:50-54).
SUPPORTED_TYPES = {
    "string",
    "boolean",
    "tinyint",
    "smallint",  # reference gap: int16 missing from its switch (cdc_utils.go:104)
    "int",
    "bigint",
    "float",
    "double",
    "decimal",  # parametrized like decimal(18,4) also accepted
    "date",
    "timestamp",
    "binary",
    "array<float>",
    "array<double>",
    "array<string>",
}


@dataclass(frozen=True)
class ColumnSpec:
    """One target column.

    ``name``    field name (CamelCase or snake_case — resolved via
                ``snake_case`` unless ``column`` overrides, matching
                tag.go:9-22).
    ``dtype``   Spark SQL type string (see SUPPORTED_TYPES).
    ``column``  explicit source-column override (gorm ``column:``).
    ``pk``      primary-key member (gorm ``primarykey``).
    ``exclude`` skip entirely (gorm ``"-"``).
    ``bool01``  decode 0/1 numerics as booleans — the reference's
                ``float64==1 → true`` rule (cdc_utils.go:98-101).
    ``epoch_ms`` numeric values are epoch-milliseconds when the
                target is timestamp (cdc_utils.go:77).
    """

    name: str
    dtype: str
    column: str | None = None
    pk: bool = False
    exclude: bool = False
    bool01: bool = False
    epoch_ms: bool = True

    @property
    def source(self) -> str:
        return self.column if self.column is not None else snake_case(self.name)

    @property
    def target(self) -> str:
        return self.source  # output uses the resolved (db) column name


@dataclass(frozen=True)
class TableSpec:
    """A registered table: (database, table) → typed schema + PK.

    Equivalent of one ``Register(group, db, table, model, handlers)``
    call (``/root/reference/cdc_manager.go:370-403``); the Kafka topic
    is ``{server}.{db}.{table}`` (cdc_manager.go:390-391).
    """

    database: str
    table: str
    columns: tuple[ColumnSpec, ...]
    nested: tuple["TableSpec", ...] = field(default=())

    def __post_init__(self):
        seen = set()
        for c in self.resolved_columns():
            base = c.dtype.split("(")[0].strip()
            if base not in SUPPORTED_TYPES and not c.dtype.startswith(("array<", "map<", "struct<")):
                raise ValueError(f"unsupported dtype {c.dtype!r} for column {c.name!r}")
            if c.source in seen:
                raise ValueError(f"duplicate resolved column {c.source!r}")
            seen.add(c.source)

    def resolved_columns(self) -> list[ColumnSpec]:
        """Non-excluded columns, with nested specs flattened
        (embedded-struct flattening, cdc_utils.go:137-141)."""
        out = [c for c in self.columns if not c.exclude]
        for sub in self.nested:
            out.extend(sub.resolved_columns())
        return out

    @property
    def pk_columns(self) -> list[str]:
        return [c.source for c in self.resolved_columns() if c.pk]

    def topic(self, server: str) -> str:
        return f"{server}.{self.database}.{self.table}"


def deals_spec() -> TableSpec:
    """The reference's own test table (``test/fff.json`` +
    ``cdc_utils_test.go:17-29``) as a spec — used by golden tests."""
    return TableSpec(
        database="deal_test",
        table="deals",
        columns=(
            ColumnSpec("EntityID", "string", column="entity_id", pk=True),
            ColumnSpec("Name", "string", column="entity_name"),
            ColumnSpec("EntityType", "int"),
            ColumnSpec("DealType", "string"),
            ColumnSpec("FinanciersEntityID", "string", column="financiers_entity_id"),
            ColumnSpec("FinanciersName", "string"),
            ColumnSpec("FinanciersType", "int"),
            ColumnSpec("FinancingCompanyDataModuleID", "string", column="financing_company_data_module_id"),
            ColumnSpec("FinancingCompanyEntityID", "string", column="financing_company_entity_id"),
            ColumnSpec("FinancingCompanyEntityType", "int"),
            ColumnSpec("FinancingCompanyName", "string"),
            ColumnSpec("Status", "int"),
            ColumnSpec("Type", "string"),
            ColumnSpec("CreatedAt", "timestamp"),
            ColumnSpec("UpdatedAt", "timestamp"),
            ColumnSpec("DeletedAt", "timestamp"),
            ColumnSpec("Internal", "string", exclude=True),  # gorm:"-" parity
        ),
    )
