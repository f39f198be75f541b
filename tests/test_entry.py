"""Driver-contract smoke: entry() runs, every queries() entry returns
rows at sf0.001, and a sample of oracle_sql() matches via DuckDB."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa

SF_DIR = "/root/testdata/sf0.001"

_SQL_SAMPLE = ["extract_text", "token_count", "lang_stats",
               "events_by_type", "dedup_exact", "knn_cosine",
               "multimodal_features", "events_asof_join",
               "events_sliding_3h", "doc_length_percentiles",
               "heavy_hitters", "orders_rollup", "revenue_by_region",
               "keyword_search", "extract_error_contract"]


def _to_pandas(res) -> pd.DataFrame:
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    res = e.entry()
    df = _to_pandas(res)
    assert len(df) > 0
    assert "extracted_text" in df.columns


def test_queries_all_return_rows(ray_session):
    import __ray_entry__ as e

    for name, fn in e.queries().items():
        df = _to_pandas(fn(SF_DIR))
        assert len(df) >= 0, name  # must not raise; dedup pairs may be 0
        assert len(df.columns) > 0, name


def test_oracles_match_sample(ray_session):
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in ["documents", "embeddings", "events", "orders", "customer",
              "lineitem", "supplier", "nation", "region", "part"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    for name in _SQL_SAMPLE:
        mine = _normalize(_to_pandas(qs[name](SF_DIR)))
        ora = _normalize(con.execute(oracles[name]).df())
        assert list(mine.columns) == list(ora.columns), name
        pd.testing.assert_frame_equal(mine, ora, check_dtype=False,
                                      rtol=0, atol=0, obj=name)
