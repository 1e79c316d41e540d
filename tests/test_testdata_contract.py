"""Schema contract for the driver-generated testdata.

The driver regenerates ``/root/testdata`` between rounds and has already
changed an encoding once (``events.ts`` shipped as TIMESTAMP(NANOS) in one
generation and plain ``timestamp[us]`` in the next).  This test loads every
table through the production loader and pins the dtypes the rest of the
codebase assumes, so an environment change surfaces as ONE obvious red test
instead of a dozen opaque downstream analysis errors.
"""

from __future__ import annotations

import os

import pytest

from block_crawler_spark.sources.tables import TABLE_NAMES, load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

# column → dtype (simpleString) per table, as loaded through load_table;
# every entry is relied on by at least one plan/operator, so a mismatch is
# a real breakage signal.  ``events.ts`` pins the POST-normalization
# contract: the loader converts any parquet encoding (TIMESTAMP(NANOS)
# read as raw longs, or plain micros read as TIMESTAMP_NTZ) to a
# session-tz timestamp.
EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp_ntz",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>", "label": "int"},
}


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_table_dtypes(spark, name):
    df = load_table(spark, SF_DIR, name)
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for col, want in EXPECTED[name].items():
        assert col in actual, f"{name}.{col} missing (have {sorted(actual)})"
        assert actual[col] == want, f"{name}.{col}: expected {want}, loaded {actual[col]}"
