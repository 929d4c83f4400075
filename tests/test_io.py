"""Tests for corpus output layout (functions/io.py)."""

import glob
import os

from tidb_cdc_spark.functions import io as IO


def _corpus(spark, n=200):
    return spark.createDataFrame(
        [(i, f"doc {i}", ["web", "books", "code"][i % 3], i * 37 % 1000) for i in range(n)],
        "doc_id long, text string, source string, quality long",
    )


class TestWriteCorpus:
    def test_one_file_per_partition_not_one_per_task(self, spark, tmp_path):
        path = str(tmp_path / "corpus")
        IO.write_corpus(_corpus(spark), path, partition_by=("source",))
        stats = {
            r.source: (r.n_files, r.n_rows)
            for r in IO.corpus_layout_stats(spark, path).collect()
        }
        assert set(stats) == {"web", "books", "code"}
        # 200 rows over 32 shuffle partitions: without the repartition
        # each source dir would hold up to 32 files; with it, data for
        # one source is clustered into few tasks
        for src, (n_files, n_rows) in stats.items():
            assert n_files <= 2, stats
            assert n_rows in (66, 67)

    def test_max_records_per_file_splits(self, spark, tmp_path):
        path = str(tmp_path / "split")
        IO.write_corpus(
            _corpus(spark, 90),
            path,
            partition_by=("source",),
            max_records_per_file=10,
        )
        stats = {r.source: r for r in IO.corpus_layout_stats(spark, path).collect()}
        for src, r in stats.items():
            assert r.rows_per_file_max <= 10
            assert r.n_files >= 3

    def test_roundtrip_preserves_data(self, spark, tmp_path):
        path = str(tmp_path / "rt")
        df = _corpus(spark, 50)
        IO.write_corpus(df, path, sort_within=("quality",))
        back = spark.read.parquet(path)
        assert sorted(
            (r.doc_id, r.text, r.source, r.quality) for r in back.collect()
        ) == sorted((r.doc_id, r.text, r.source, r.quality) for r in df.collect())

    def test_sort_within_orders_rows_in_files(self, spark, tmp_path):
        path = str(tmp_path / "sorted")
        IO.write_corpus(_corpus(spark), path, sort_within=("quality",))
        import pyarrow.parquet as pq

        for f in glob.glob(os.path.join(path, "source=*", "*.parquet")):
            q = pq.read_table(f, columns=["quality"])["quality"].to_pylist()
            assert q == sorted(q), f
