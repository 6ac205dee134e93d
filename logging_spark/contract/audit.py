"""audit family: contract queries (+ oracles) — auto-split from the original contract module by tools/split_contract.py; statement order preserved."""

from __future__ import annotations

from logging_spark.contract._fixtures import (
    F, _read, hash60_sql, table_fingerprint)


def register(q):

    # -- table fingerprint (operators/dq.py): commutative bit_xor of
    # 60-bit md5 row hashes per returnflag — the cross-run content
    # checksum. Canonicalization is integer-exact (cents / floored
    # quantities), never raw doubles.
    def audit_fingerprint(spark, sf):
        li = _read(spark, sf, "lineitem")
        return table_fingerprint(
            li,
            cols=[F.col("l_orderkey"), F.col("l_linenumber"),
                  F.floor("l_quantity").cast("long"),
                  F.round(F.col("l_extendedprice") * 100).cast("long")],
            group_by=["l_returnflag"])
    q["audit_fingerprint"] = audit_fingerprint


def register_oracles(o):

    _fp_row = ("concat_ws(chr(31), coalesce(CAST(l_orderkey AS VARCHAR), ''),"
               " coalesce(CAST(l_linenumber AS VARCHAR), ''),"
               " coalesce(CAST(CAST(floor(l_quantity) AS BIGINT) AS VARCHAR), ''),"
               " coalesce(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)"
               " AS VARCHAR), ''))")
    o["audit_fingerprint"] = f"""
SELECT l_returnflag,
       bit_xor({hash60_sql(_fp_row, 'fp')}) AS fingerprint,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag"""
