"""Schema-evolution contract tests: stream-vs-spec drift.

The reference has no evolution story — unknown incoming columns are
silently dropped by the reflection fall-through
(``/root/reference/cdc_utils.go:96-123``) while the deployment
replicates DDL upstream (``test/deals_changefeed.toml:44``
sync-ddl=true). The engine's declared contract (``TableSpec.evolve``
docstring): unknown stream columns are ignored-but-observable,
missing spec columns decode NULL, type changes are adopted via the
safe-widening lattice only.
"""

import json

import pytest

from tidb_cdc_spark.cdc import parse_cdc, schema_drift
from tidb_cdc_spark.cdc.spec import ColumnSpec, TableSpec, is_widening

SPEC = TableSpec(
    database="d",
    table="t",
    columns=(
        ColumnSpec("K", "string", column="k", pk=True),
        ColumnSpec("V", "int"),
    ),
)


def _df(spark, msgs):
    return spark.createDataFrame([(m,) for m in msgs], "value string")


def _msg(data, op="insert", old=None):
    m = {"database": "d", "table": "t", "type": op, "ts": 1, "data": data}
    if old is not None:
        m["old"] = old
    return json.dumps(m)


class TestDriftSemantics:
    def test_unknown_stream_column_ignored_by_parse(self, spark):
        # upstream DDL added a column the spec doesn't declare: typed
        # parse output is IDENTICAL to a stream without it
        with_extra = parse_cdc(
            _df(spark, [_msg({"k": "a", "v": 1, "added": "x"})]), SPEC
        ).collect()
        without = parse_cdc(_df(spark, [_msg({"k": "a", "v": 1})]), SPEC).collect()
        assert [(r.op, tuple(r.after)) for r in with_extra] == [
            (r.op, tuple(r.after)) for r in without
        ]

    def test_missing_spec_column_decodes_null(self, spark):
        # upstream DDL dropped `v`: same NULL as an explicit JSON null
        rows = parse_cdc(_df(spark, [_msg({"k": "a"})]), SPEC).collect()
        assert rows[0].after.k == "a" and rows[0].after.v is None

    def test_schema_drift_report(self, spark):
        msgs = [
            _msg({"k": "a", "v": 1, "added": "x"}),
            _msg({"k": "b", "v": 2, "added": "y"}),
            _msg({"k": "c"}),  # v missing
            json.dumps(  # other table: excluded from the report
                {"database": "d", "table": "other", "type": "insert",
                 "ts": 1, "data": {"zz": 1}}
            ),
        ]
        got = {
            (r.col_name, r.kind): r.n_events
            for r in schema_drift(_df(spark, msgs), SPEC).collect()
        }
        assert got == {
            ("added", "unknown_in_stream"): 2,
            ("v", "missing_from_stream"): 1,
        }


class TestEvolve:
    def test_add_column_is_parsed_after_evolve(self, spark):
        evolved = SPEC.evolve(add=(ColumnSpec("Added", "string"),))
        rows = parse_cdc(
            _df(spark, [_msg({"k": "a", "v": 1, "added": "x"})]), evolved
        ).collect()
        assert rows[0].after.added == "x"

    def test_widen_recovers_overflow_values(self, spark):
        # upstream type change int → bigint: the old spec decodes an
        # out-of-range value to NULL (lenient try_cast); widening
        # adopts it without reinterpreting any previously-valid value
        big = 2**40
        msg = _msg({"k": "a", "v": big})
        assert parse_cdc(_df(spark, [msg]), SPEC).collect()[0].after.v is None
        widened = SPEC.evolve(widen={"v": "bigint"})
        assert parse_cdc(_df(spark, [msg]), widened).collect()[0].after.v == big
        # previously-valid values decode identically
        small = _msg({"k": "a", "v": 7})
        assert parse_cdc(_df(spark, [small]), widened).collect()[0].after.v == 7

    def test_drop_column(self):
        evolved = SPEC.evolve(drop=("v",))
        assert [c.source for c in evolved.resolved_columns()] == ["k"]

    def test_drop_pk_rejected(self):
        with pytest.raises(ValueError, match="pk"):
            SPEC.evolve(drop=("k",))

    def test_narrowing_rejected(self):
        wide = TableSpec(
            "d", "t", (ColumnSpec("K", "string", pk=True), ColumnSpec("V", "bigint"))
        )
        with pytest.raises(ValueError, match="widening"):
            wide.evolve(widen={"v": "int"})

    def test_unknown_or_duplicate_column_rejected(self):
        with pytest.raises(ValueError, match="unknown column"):
            SPEC.evolve(widen={"nope": "bigint"})
        with pytest.raises(ValueError, match="already exists"):
            SPEC.evolve(add=(ColumnSpec("V", "bigint"),))

    def test_excluded_column_name_collisions(self):
        spec = TableSpec(
            "d", "t",
            (
                ColumnSpec("K", "string", pk=True),
                ColumnSpec("Hidden", "int", exclude=True),
            ),
        )
        # adding a column whose source collides with an EXCLUDED
        # column must be rejected — the excluded column still owns
        # the source name
        with pytest.raises(ValueError, match="already exists"):
            spec.evolve(add=(ColumnSpec("Hidden", "bigint"),))
        # widen/drop of an excluded column gets a distinct error, not
        # the misleading 'unknown column'
        with pytest.raises(ValueError, match="excluded"):
            spec.evolve(widen={"hidden": "bigint"})
        with pytest.raises(ValueError, match="excluded"):
            spec.evolve(drop=("hidden",))

    def test_nested_specs_evolve_in_place(self):
        spec = TableSpec(
            "d", "t",
            (ColumnSpec("K", "string", pk=True),),
            nested=(TableSpec("d", "t", (ColumnSpec("Inner", "int"),)),),
        )
        evolved = spec.evolve(widen={"inner": "bigint"})
        assert [(c.source, c.dtype) for c in evolved.resolved_columns()] == [
            ("k", "string"), ("inner", "bigint"),
        ]

    def test_deeply_nested_specs_evolve(self):
        # widening/dropping must reach EVERY nesting depth, not just
        # the first level (validation resolves the flattened columns,
        # so application must too)
        deep = TableSpec("d", "t", (ColumnSpec("DeepV", "int"),))
        mid = TableSpec("d", "t", (ColumnSpec("MidV", "int"),), nested=(deep,))
        spec = TableSpec(
            "d", "t", (ColumnSpec("K", "string", pk=True),), nested=(mid,)
        )
        evolved = spec.evolve(widen={"deep_v": "bigint"}, drop=("mid_v",))
        assert [(c.source, c.dtype) for c in evolved.resolved_columns()] == [
            ("k", "string"), ("deep_v", "bigint"),
        ]


class TestWideningLattice:
    @pytest.mark.parametrize(
        "old,new",
        [
            ("int", "bigint"),
            ("smallint", "double"),
            ("float", "double"),
            ("date", "timestamp"),
            ("bigint", "string"),
            ("decimal(12,2)", "decimal(18,2)"),
            ("decimal(12,2)", "decimal(14,4)"),
            ("int", "decimal(12,2)"),
            ("bigint", "decimal(21,2)"),
            ("int", "int"),
        ],
    )
    def test_widening_accepted(self, old, new):
        assert is_widening(old, new)

    @pytest.mark.parametrize(
        "old,new",
        [
            ("bigint", "int"),
            ("bigint", "double"),  # loses integers above 2^53
            ("double", "float"),
            ("string", "int"),
            ("timestamp", "date"),
            ("decimal(18,2)", "decimal(12,2)"),
            ("decimal(12,2)", "decimal(13,4)"),  # fewer integer digits
            ("int", "decimal(8,2)"),  # 6 integer digits < int range
            ("bigint", "decimal(18,0)"),
        ],
    )
    def test_narrowing_rejected(self, old, new):
        assert not is_widening(old, new)


class TestStreamingContinuity:
    def test_connector_restart_with_evolved_spec(self, spark, tmp_path):
        """Operational path: batch 1 flows under spec v1; upstream DDL
        adds a column; the connector restarts with the EVOLVED spec on
        the SAME checkpoint and snapshot — old rows read NULL for the
        new column, new rows carry it."""
        import os

        from tidb_cdc_spark.sources import maxwell_file_stream
        from tidb_cdc_spark.streaming import (
            Connector,
            ConnectorConfig,
            ParquetSnapshotSink,
        )

        events_dir = tmp_path / "in"

        def write_batch(name, msgs):
            os.makedirs(events_dir, exist_ok=True)
            tmp = events_dir / f".{name}.tmp"
            with open(tmp, "w") as f:
                f.write("\n".join(msgs))
            os.replace(tmp, events_dir / name)

        def run(spec):
            conn = Connector(
                ConnectorConfig(
                    server_name="srv", checkpoint_root=str(tmp_path / "ckpt")
                )
            )
            conn.register(
                spec, [sink], source=maxwell_file_stream(spark, str(events_dir))
            )
            conn.start(spark, available_now=True)
            conn.await_termination()

        sink = ParquetSnapshotSink(str(tmp_path / "snap"))
        write_batch("b1.jsonl", [_msg({"k": "a", "v": 1})])
        run(SPEC)
        assert {r.k for r in sink.read_current(spark).collect()} == {"a"}

        evolved = SPEC.evolve(add=(ColumnSpec("Added", "string"),))
        write_batch("b2.jsonl", [_msg({"k": "b", "v": 2, "added": "x"})])
        run(evolved)
        rows = {r.k: r for r in sink.read_current(spark).collect()}
        assert rows["a"].added is None  # pre-evolution row, null backfill
        assert rows["b"].added == "x" and rows["b"].v == 2


class TestDecimalColumns:
    def test_decimal_roundtrip_exact(self, spark):
        # the reference's reflection switch has no decimal case
        # (values survive only as float64/string, SURVEY §1.2); the
        # engine decodes exact DECIMAL from the canonical JSON text
        from decimal import Decimal

        spec = TableSpec(
            "d", "t",
            (ColumnSpec("K", "string", column="k", pk=True),
             ColumnSpec("Price", "decimal(12,2)")),
        )
        rows = parse_cdc(
            _df(spark, [
                _msg({"k": "a", "price": "12345678.91"}),
                _msg({"k": "b", "price": "0.05"}),
                _msg({"k": "c", "price": "not-money"}),  # lenient NULL
            ]),
            spec,
        ).collect()
        got = {r.after.k: r.after.price for r in rows}
        assert got == {
            "a": Decimal("12345678.91"),
            "b": Decimal("0.05"),
            "c": None,
        }
