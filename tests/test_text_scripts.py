"""ext_text_scripts (r17): Unicode-script detection contracts on crafted
multibyte docs — the clean corpus is ASCII-only, so the interesting
semantics (CJK/Cyrillic dominance, fixed-priority ties, mixed-script
flag, codepoint counting) live here, cross-checked against the DuckDB
oracle on the same rows."""

import duckdb
import pandas as pd

from flink_cdc_multi_spark.plans.extensions import (
    EXT_ORACLE_SQL,
    ext_text_scripts,
)


def test_crafted_scripts_cross_engine(spark, tmp_path):
    rows = [
        (0, "hello plain latin words", "en"),          # latin
        (1, "日本語のテキストです 漢字多数 中文文本", "ja"),  # cjk (kanji/hanzi)
        (2, "русский текст без латиницы", "ru"),       # cyrillic
        (3, "mixed текст with latin and русский", "ru"),  # latin dom, mixed
        (4, "12345 67890", "en"),                      # digit
        (5, "!!! ??? ...", "en"),                      # other (no class)
        (6, "abc абв", "ru"),                          # 3v3 tie -> latin (priority)
        (7, "", "en"),                                 # blank: dropped
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    pdf["source"] = "s"
    pdf["n_chars"] = pdf["text"].str.len()
    pdf.to_parquet(tmp_path / "documents.parquet")

    got = {
        (r["lang"], r["script"]): (r["n_docs"], r["n_mixed"])
        for r in ext_text_scripts(spark, str(tmp_path)).collect()
    }
    assert got[("en", "latin")] == (1, 0)
    assert got[("ja", "cjk")] == (1, 0)
    assert got[("ru", "cyrillic")] == (1, 0)
    # doc 3: latin-count > cyrillic-count -> latin dominant, mixed=1;
    # doc 6: exact tie -> fixed priority picks latin, mixed=1
    assert got[("ru", "latin")] == (2, 2)
    assert got[("en", "digit")] == (1, 0)
    assert got[("en", "other")] == (1, 0)
    assert sum(n for n, _ in got.values()) == 7  # blank doc dropped

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet'"
    )
    oracle = {
        (lang, script): (n, m)
        for lang, script, n, m in con.execute(
            EXT_ORACLE_SQL["ext_text_scripts"]
        ).fetchall()
    }
    assert oracle == got
