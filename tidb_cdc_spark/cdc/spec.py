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


#: Safe type-widening lattice: old type → target types every already-
#: accepted value survives into unchanged (no silent reinterpretation,
#: no precision loss). ``string`` accepts anything (the string-map
#: phase is the canonical text form). bigint→double is deliberately
#: NOT a widening (loses integer precision above 2^53).
_WIDENING: dict[str, set[str]] = {
    "tinyint": {"smallint", "int", "bigint", "double", "string"},
    "smallint": {"int", "bigint", "double", "string"},
    "int": {"bigint", "double", "string"},
    "bigint": {"string"},
    "float": {"double", "string"},
    "double": {"string"},
    "boolean": {"string"},
    "date": {"timestamp", "string"},
    "timestamp": {"string"},
    "decimal": {"string"},  # plus wider decimals, handled below
    "binary": set(),
    "string": set(),
}

_DECIMAL_RE = re.compile(r"^decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)$")


def _decimal_params(dtype: str) -> tuple[int, int] | None:
    m = _DECIMAL_RE.match(dtype.strip().lower())
    return (int(m.group(1)), int(m.group(2))) if m else None


def is_widening(old: str, new: str) -> bool:
    """True iff ``old`` → ``new`` is on the safe-widening lattice."""
    old_l, new_l = old.strip().lower(), new.strip().lower()
    if old_l == new_l:
        return True
    od, nd = _decimal_params(old_l), _decimal_params(new_l)
    if od is not None:
        if new_l == "string":
            return True
        # wider decimal: no fewer integer digits AND no fewer
        # fractional digits than the old type can hold
        return nd is not None and nd[0] - nd[1] >= od[0] - od[1] and nd[1] >= od[1]
    if nd is not None:
        # integer → decimal that can hold the integer range exactly
        digits = {"tinyint": 3, "smallint": 5, "int": 10, "bigint": 19}
        return old_l in digits and nd[0] - nd[1] >= digits[old_l]
    return new_l in _WIDENING.get(old_l.split("(")[0], set())


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

    def all_columns(self) -> list[ColumnSpec]:
        """Every declared column INCLUDING excluded ones, flattened —
        the name-collision domain for ``evolve`` (an excluded column
        still owns its source name)."""
        out = list(self.columns)
        for sub in self.nested:
            out.extend(sub.all_columns())
        return out

    def evolve(
        self,
        add: tuple[ColumnSpec, ...] = (),
        widen: dict[str, str] | None = None,
        drop: tuple[str, ...] = (),
    ) -> "TableSpec":
        """Declared schema-evolution contract (stream-vs-spec drift).

        The reference has NO evolution story: unknown incoming columns
        are silently skipped by the reflection fall-through
        (``cdc_utils.go:96-123``) while the deployment replicates DDL
        upstream (``test/deals_changefeed.toml:44`` sync-ddl=true) —
        so a real user's spec drifts from the stream within weeks.
        The engine's contract:

        - **unknown column in the stream** → ignored by ``parse_cdc``
          (typed ``from_json`` extracts spec columns only), but
          OBSERVABLE via ``parse.schema_drift``; adopt it with
          ``evolve(add=...)``.
        - **spec column absent from the stream** → NULL in the typed
          image (same as an explicit JSON null); observable via
          ``schema_drift``; retire it with ``evolve(drop=...)``.
        - **upstream type change** → values that stop fitting decode
          to NULL (lenient ``try_cast``); ``evolve(widen=...)`` moves
          the column up the safe-widening lattice — widening only, so
          every value the old spec accepted decodes identically under
          the new one (no silent reinterpretation).

        ``widen``/``drop`` key on the RESOLVED source column name.
        Flattened nested specs are evolved in place. PK columns can be
        widened but not dropped.
        """
        widen = dict(widen or {})
        drop_set = set(drop)
        known = {c.source for c in self.resolved_columns()}
        excluded = {c.source for c in self.all_columns() if c.exclude}
        for name in list(widen) + list(drop_set):
            if name in excluded:
                raise ValueError(
                    f"evolve: column {name!r} is excluded from the spec; "
                    "un-exclude it before widening or dropping"
                )
            if name not in known:
                raise ValueError(f"evolve: unknown column {name!r}")
        for a in add:
            if a.source in known or a.source in excluded:
                raise ValueError(f"evolve: column {a.source!r} already exists")

        def evolve_one(c: ColumnSpec) -> ColumnSpec | None:
            if c.source in drop_set:
                if c.pk:
                    raise ValueError(f"evolve: cannot drop pk column {c.source!r}")
                return None
            if c.source in widen:
                new_t = widen.pop(c.source)
                if not is_widening(c.dtype, new_t):
                    raise ValueError(
                        f"evolve: {c.dtype!r} -> {new_t!r} for {c.source!r} "
                        "is not a safe widening"
                    )
                return ColumnSpec(
                    c.name, new_t, c.column, c.pk, c.exclude, c.bool01, c.epoch_ms
                )
            return c

        def evolve_spec(s: "TableSpec", extra: tuple[ColumnSpec, ...]) -> "TableSpec":
            # recurse to EVERY nesting depth — validation resolves the
            # flattened columns, so application must reach them all
            return TableSpec(
                s.database,
                s.table,
                tuple(e for c in s.columns if (e := evolve_one(c)) is not None)
                + extra,
                tuple(evolve_spec(sub, ()) for sub in s.nested),
            )

        return evolve_spec(self, tuple(add))

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
