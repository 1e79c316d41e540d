"""Round-14 evidence tests: the ADVICE r13 hardening pins (audio int16
wrap on high UTF-8 bytes, twin-id aliasing), the trained-PQ ADC→rerank
two-stage query, the video perceptual family, and the de-degenerated LM
gate attribution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF0 = "/root/testdata/sf0.001"

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(rows, DOC_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def _duck_rows(sql: str, sf_dir: str):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    return sorted(map(tuple, con.execute(sql).fetchall()))


def test_audio_energy_no_int16_wrap_on_high_bytes(spark, tmp_path):
    """ADVICE r13 (medium): at the old AUDIO_SAMPLE_SCALE=100 the ×2 gain
    twin's numpy ``astype('<i2')`` silently WRAPPED int16 for source bytes
    ≥ 228 (CJK/emoji UTF-8 lead bytes) while the DuckDB oracle computed
    unwrapped energies — a latent Spark/oracle hash divergence on any
    non-ASCII corpus.  With the scale lowered so 2·(255−64)·scale fits
    int16, this corpus — CJK text whose UTF-8 bytes reach 0xE6–0xF0,
    planted on gain-twin doc_ids (% AUDIO_GAIN_MOD == 0) — must (1) agree
    with the oracle row-for-row and (2) keep the exact gain theorem: the
    louder twin pairs with its original at Hamming 0."""
    from block_crawler_spark.plans.media_ops import (
        AUDIO_GAIN_MOD,
        PHASH_TWIN_OFFSET,
        _media_audio_energy_sql,
        media_audio_energy_query,
    )

    cjk = "日本語のテキストと絵文字🎵が高位バイトを運ぶ"  # lead bytes ≥ 0xE3
    rows = [
        (i * AUDIO_GAIN_MOD, (cjk + "、段落" + str(i)) * (3 + i % 4), "ja", "s", 60)
        for i in range(6)
    ]
    raw = rows[0][1].encode("utf-8")
    assert max(raw) >= 228, "corpus must exercise the wrap-prone byte range"
    sf = _write_docs(spark, tmp_path, rows)

    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in media_audio_energy_query(spark, sf).collect()
    )
    assert got == _duck_rows(_media_audio_energy_sql(), sf)
    for doc_id, *_ in rows:
        assert (doc_id, doc_id + PHASH_TWIN_OFFSET, 0) in got, doc_id


def test_planted_stage_rejects_twin_id_aliasing(spark, tmp_path):
    """ADVICE r13 (low): a corpus carrying doc_id ≥ PHASH_TWIN_OFFSET
    would alias minted twin ids and silently mispair — every planted
    stage must fail loudly instead."""
    from pyspark.errors.exceptions.captured import PythonException

    from block_crawler_spark.plans.media_ops import (
        PHASH_TWIN_OFFSET,
        media_audio_energy_query,
        media_image_dhash_query,
        media_phash_near_dup_query,
    )

    sf = _write_docs(
        spark, tmp_path, [(PHASH_TWIN_OFFSET + 1, "word " * 40, "en", "s", 200)]
    )
    for q in (media_phash_near_dup_query, media_image_dhash_query, media_audio_energy_query):
        with pytest.raises(PythonException, match="PHASH_TWIN_OFFSET"):
            q(spark, sf).count()
