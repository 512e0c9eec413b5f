"""Spot-check of the relational query pack against DuckDB at sf0.001
(the driver runs the full pack at sf0.01; tools/oracle_check.py runs it
all locally)."""

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

FAST_QUERIES = [
    "q01_pricing_summary", "q03_top_orders", "q_sessionize_events",
    "q_asof_prior_view", "q_value_band_join", "q_set_ops",
    "q_exact_dedup", "q_minhash_lsh_buckets", "q_embed_cosine_topk",
    "q_decontaminate", "q_stratified_sample", "q_dedup_components",
    "q_pack_shards", "q_bigram_typicality",
    "x_docwrap_roundtrip",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", FAST_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    import __spark_entry__ as em

    got = _norm(em.queries()[name](spark, SF_DIR).toPandas())
    exp = _norm(duck.sql(em.oracle_sql()[name]).df())
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, rtol=0, atol=0)


def test_entry_smoke(spark):
    import __spark_entry__ as em

    df = em.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"doc_id", "md"}


def test_bucketed_signature_table_join_without_shuffle(spark):
    """The materialized band-key table (production dedup shape) self-joins
    on its bucket key with NO Exchange on either side."""
    from mineru_spark.queries import write_signature_table

    write_signature_table(spark, "/root/testdata/sf0.001",
                          table="tq_sigs", n_buckets=4)
    t = spark.table("tq_sigs")
    j = (t.alias("a").join(t.alias("b"), ["bk"])
         .where("a.doc_id < b.doc_id"))
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(bk" not in plan
    assert j.count() >= 0
    spark.sql("DROP TABLE IF EXISTS tq_sigs")


def test_every_query_has_an_oracle():
    """The driver contract is fully covered: every queries() entry has an
    oracle_sql() entry (no rows-only rows left)."""
    import __spark_entry__ as e
    q, o = set(e.queries()), set(e.oracle_sql())
    assert q <= o, f"missing oracles: {sorted(q - o)}"


def test_golden_builders_cold_cache(tmp_path, monkeypatch):
    """Golden-parquet oracles must rebuild from a cold cache directory
    (fresh machine / new source hash): build one cheap golden end-to-end
    and read it back with DuckDB like the driver does."""
    import duckdb
    import mineru_spark.golden as g

    monkeypatch.setattr(g, "GOLDEN_ROOT", str(tmp_path / "golden"))
    path = g.ensure_golden_media(50)
    assert path.startswith(str(tmp_path))
    rows = duckdb.sql(
        f"SELECT COUNT(*), SUM(CASE WHEN decode_ok THEN 1 ELSE 0 END) "
        f"FROM read_parquet('{path}')").fetchone()
    assert rows == (50, 50)
    # idempotent: second call returns the cached file
    assert g.ensure_golden_media(50) == path


def test_clean_filter_all_reasons(spark, tmp_path):
    """Every reason of the cleaning cascade fires and both engines agree
    on crafted documents (the sf0.01 corpus only exercises ok/lang_und)."""
    import mineru_spark.queries as q

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6, 7],
        "text": [
            "the cat and the dog went to the house",        # ok
            "the cat and the dog went to the house",        # duplicate
            "the tiny one",                                  # too_few_words
            "the word " + "x" * 50 + " is the longest one here",  # long_word
            "the end. .. ,, !! ?? ;; :: () [] {} -- .. ,,",  # high_punct
            "the cat sat " + "on it " * 20 + "the end",      # repetitive
            "zz qq ww rr tt yy uu ii oo pp",                 # lang_und
        ],
        "lang": ["en"] * 7, "source": ["t"] * 7,
    })
    docs["n_chars"] = docs["text"].str.len()
    sf_dir = str(tmp_path)
    docs.to_parquet(f"{sf_dir}/documents.parquet", index=False)

    got = {r["doc_id"]: (r["reason"], r["keep"])
           for r in q.q_clean_filter(spark, sf_dir).collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')")
    want = {int(r[0]): (r[1], bool(r[2]))
            for r in con.sql(q.ORACLES["q_clean_filter"]).fetchall()}
    assert got == want
    assert [got[i][0] for i in range(1, 8)] == [
        "ok", "duplicate", "too_few_words", "long_word", "high_punct",
        "repetitive", "lang_und"]


def test_dedup_components_chain_propagation(spark):
    """A 9-node chain (diameter 8) forces MULTIPLE propagation rounds
    through the shipped loop — every node must still collapse to comp=1,
    and a disjoint 2-cycle plus an isolated pairless node must not."""
    import mineru_spark.queries as q

    chain = [(i, i + 1) for i in range(1, 9)]          # 1-2-...-9
    other = [(20, 21)]
    pairs = spark.createDataFrame(chain + other, ["da", "db"])
    got = {r["doc_id"]: r["comp"]
           for r in q._cc_labels_from(pairs).collect()}
    q.cache.release("cc_edges")
    assert got == {**{i: 1 for i in range(1, 10)}, 20: 20, 21: 20}


def test_dedup_components_union_find_golden(spark, tmp_path):
    """Component assignment + canonical choice on a crafted corpus,
    checked against an INDEPENDENT union-find over the query's own pair
    list (third algorithm besides the Spark loop and DuckDB recursion).
    Exact-duplicate texts guarantee hamming-0 pairs, so the corpus is
    certain to contain a non-trivial cluster."""
    import mineru_spark.queries as q

    base = ("the quick brown fox jumps over the lazy dog near the wide "
            "river bank just before sunrise on a calm autumn morning")
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": [base, base, base + " with one extra tail word",
                 "a completely different document about distributed "
                 "query engines and shuffle partitioning strategies",
                 "a completely different document about distributed "
                 "query engines and shuffle partitioning strategies",
                 "an unrelated singleton with its own vocabulary "
                 "entirely disjoint from everything else here today"],
        "lang": ["en"] * 6, "source": ["t"] * 6,
    })
    docs["n_chars"] = docs["text"].str.len()
    sf_dir = str(tmp_path)
    docs.to_parquet(f"{sf_dir}/documents.parquet", index=False)

    pair_rows = [(r["da"], r["db"])
                 for r in q.q_simhash_near_pairs(spark, sf_dir).collect()]
    assert any(set(p) <= {1, 2, 3} for p in pair_rows)  # cluster exists

    # independent union-find golden
    parent = {i: i for i in docs["doc_id"]}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pair_rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want_comp = {i: find(i) for i in docs["doc_id"]}

    out = q.q_dedup_components(spark, sf_dir).collect()
    got_comp = {r["doc_id"]: r["comp"] for r in out}
    assert got_comp == want_comp

    # exactly one canonical per component: longest text, doc_id tiebreak
    by_comp: dict = {}
    for r in out:
        by_comp.setdefault(r["comp"], []).append(r)
    lens = dict(zip(docs["doc_id"], docs["n_chars"]))
    for comp, members in by_comp.items():
        canon = [r["doc_id"] for r in members if r["is_canonical"]]
        want = sorted((m["doc_id"] for m in members),
                      key=lambda i: (-lens[i], i))[0]
        assert canon == [want]
