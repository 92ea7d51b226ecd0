"""tools/scaleup.py contract: the derived k-times corpus must keep
referential integrity (shifted foreign keys land on shifted parents),
multiply replicated tables exactly k times, leave the dimension enums
untouched, and keep document copies distinct — otherwise the scaling
curve measures a broken schema, not the engine."""

from pyspark.sql import functions as F


def test_scaleup_preserves_fk_and_cardinality(spark, tmp_path):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "scaleup", "tools/scaleup.py"
    )
    scaleup = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(scaleup)

    src = "/root/testdata/sf0.001"
    k = 3
    strides = scaleup._strides(spark, src)

    tables = {}
    for t in scaleup.REPLICATED:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        tables[t] = (df, scaleup.scale_table(df, t, k, strides))

    # exact k-times cardinality
    for t, (base, scaled) in tables.items():
        assert scaled.count() == k * base.count(), t

    # FK closure: every scaled child key has a scaled parent
    fks = [
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ]
    for child, ckey, parent, pkey in fks:
        orphans = (
            tables[child][1]
            .join(
                tables[parent][1].select(F.col(pkey).alias(ckey)),
                ckey,
                "left_anti",
            )
            .count()
        )
        assert orphans == 0, f"{child}.{ckey} -> {parent}.{pkey}"

    # key uniqueness survives the shift (no collisions across copies)
    for t, key in (("customer", "c_custkey"), ("orders", "o_orderkey")):
        scaled = tables[t][1]
        assert scaled.select(key).distinct().count() == scaled.count()

    # document copies are pairwise distinct text
    docs = tables["documents"][1]
    assert docs.select("text").distinct().count() == docs.count() or (
        # source dups may exist; require only that each source doc's
        # k copies are distinct from each other
        docs.groupBy("text").count().agg(F.max("count")).collect()[0][0]
        <= spark.read.parquet(f"{src}/documents.parquet")
        .groupBy("text")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
