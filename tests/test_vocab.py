"""pipeline_vocab_pairs + text_unigram_logprob vs independent Python
replicas, plus the ITERATED BPE-style merge loop the one-round query
statistic feeds (the loop is driver-side control flow over a per-round
Spark aggregate — counted here in pure Python on the same tokens)."""

from __future__ import annotations

import math
from collections import Counter

from tests.conftest import SF_SMALL


def _toks(spark):
    from kektordb_spark.tables import load_tables

    load_tables(spark, SF_SMALL)
    return [
        r["toks"]
        for r in spark.table("docs_tok_par").select("toks").collect()
    ]


def test_vocab_pairs_matches_python(spark):
    from kektordb_spark.plans.registry import queries

    toks = _toks(spark)
    cnt = Counter()
    for t in toks:
        for a, b in zip(t, t[1:]):
            cnt[(a, b)] += 1
    expected = sorted(
        ((c, a, b) for (a, b), c in cnt.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:32]
    got = [
        (r["cnt"], r["w1"], r["w2"])
        for r in queries()["pipeline_vocab_pairs"](spark, SF_SMALL).collect()
    ]
    assert got == expected


def test_iterated_bpe_merges_converge():
    """The merge loop the pair statistic drives: merging the argmax
    pair strictly decreases the corpus token count and never produces
    a pair count larger than the previous argmax."""
    corpus = [
        list("abracadabra"), list("banana"), list("cabbage"), list("abba")
    ]
    last_best = math.inf
    for _ in range(5):
        cnt = Counter()
        for t in corpus:
            for p in zip(t, t[1:]):
                cnt[p] += 1
        if not cnt:
            break
        (a, b), c = min(
            cnt.items(), key=lambda kv: (-kv[1], kv[0])
        )
        assert c <= last_best
        last_best = c
        merged = []
        n_before = sum(len(t) for t in corpus)
        for t in corpus:
            out, i = [], 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == a and t[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(t[i])
                    i += 1
            merged.append(out)
        corpus = merged
        assert sum(len(t) for t in corpus) == n_before - c


def test_unigram_logprob_matches_python(spark):
    from kektordb_spark.plans.registry import queries

    toks = _toks(spark)
    lm = Counter()
    for t in toks:
        lm.update(t)
    n = sum(lm.values())
    got = {
        r["doc_id"]: (r["n_toks"], r["avg_logprob"], r["ppl_proxy"])
        for r in queries()["text_unigram_logprob"](spark, SF_SMALL).collect()
    }
    docs = [
        (r["doc_id"], r["toks"])
        for r in spark.table("docs_tok_par").select("doc_id", "toks").collect()
        if r["toks"]
    ]
    assert set(got) == {d for d, _ in docs}
    for doc_id, t in docs:
        avg = round(sum(math.log(lm[x] / n) for x in t) / len(t), 5)
        assert got[doc_id][0] == len(t)
        assert abs(got[doc_id][1] - avg) <= 1e-5
        assert abs(got[doc_id][2] - round(math.exp(-avg), 3)) <= 2e-3


def test_incremental_dedup_never_compares_old_vs_old(spark):
    """Every reported row pairs a NEW doc with a CORPUS doc; best-match
    pick is deterministic (round-6 jaccard, lowest old id)."""
    from kektordb_spark.plans.registry import queries

    rows = queries()["dedup_incremental"](spark, SF_SMALL).collect()
    assert rows, "fixture contains near-dup new docs"
    seen = set()
    for r in rows:
        assert r["new_id"] % 10 == 7
        assert r["dup_of"] % 10 != 7
        assert r["jaccard"] >= 0.8
        assert r["new_id"] not in seen  # one best match per new doc
        seen.add(r["new_id"])


def test_split_stratified_fractions_and_determinism(spark):
    from kektordb_spark.plans.registry import queries

    q = queries()["pipeline_split_stratified"]
    a = sorted(map(tuple, q(spark, SF_SMALL).collect()))
    b = sorted(map(tuple, q(spark, SF_SMALL).collect()))
    assert a == b  # seeded hash: bit-stable across runs
    total = {}
    for lang, source, split, n, frac in a:
        total[split] = total.get(split, 0) + n
    n_all = sum(total.values())
    assert 0.85 <= total["train"] / n_all <= 0.95
    assert 0.02 <= total["val"] / n_all <= 0.08
    assert 0.02 <= total["test"] / n_all <= 0.08


def _bpe_python(toks_list, rounds):
    """Independent replica of the full BPE training loop: count
    adjacent pairs, merge the (cnt DESC, w1, w2) argmax greedily
    left-to-right, repeat."""
    corpus = [list(t) for t in toks_list]
    merges = []
    for step in range(1, rounds + 1):
        cnt = Counter()
        for t in corpus:
            for a, b in zip(t, t[1:]):
                cnt[(a, b)] += 1
        (w1, w2), c = min(
            cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, w1, w2, c))
        out = []
        for t in corpus:
            res, i = [], 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == w1 and t[i + 1] == w2:
                    res.append(w1 + " " + w2)
                    i += 2
                else:
                    res.append(t[i])
                    i += 1
            out.append(res)
        corpus = out
    return merges


def test_bpe_train_matches_python_and_fold_form(spark):
    """Three-way pin: the Arrow-kernel Spark runner (bpe_train), the
    pure-SQL fold form (bpe_train_sql('spark') — the dialect text the
    DuckDB oracle mirrors), and an independent Python replica must all
    produce the same merge table."""
    from kektordb_spark.operators.pipeline import (
        BPE_ROUNDS, bpe_train, bpe_train_sql)
    from kektordb_spark.tables import load_tables

    load_tables(spark, SF_SMALL)
    toks = [
        r["toks"] for r in spark.table("docs_tok").select("toks").collect()
    ]
    want = _bpe_python(toks, BPE_ROUNDS)
    runner = [
        (r.step, r.w1, r.w2, r.cnt) for r in bpe_train(spark).collect()
    ]
    fold = [
        (r.step, r.w1, r.w2, r.cnt)
        for r in spark.sql(bpe_train_sql("spark")).collect()
    ]
    assert runner == want
    assert fold == want


def test_bpe_dry_round_is_identity_not_empty(spark):
    """ADVICE r4 guard: a corpus where every doc has <2 tokens produces
    NO adjacent pairs, so each round's argmax is the null sentinel —
    the merge must pass tokens through unchanged (and the trainer must
    return an empty merge table), not CROSS JOIN the corpus away."""
    import duckdb

    from kektordb_spark.operators.pipeline import (
        bpe_apply, bpe_apply_sql, bpe_train, bpe_train_sql)

    df = spark.createDataFrame(
        [(1, ["a"]), (2, []), (3, ["b"])], "doc_id: long, toks: array<string>")
    df.createOrReplaceTempView("_dry_docs")

    audit = bpe_apply(spark, source="_dry_docs").collect()
    assert [(r.doc_id, r.n_toks_before, r.n_toks_after) for r in audit] == [
        (1, 1, 1), (2, 0, 0), (3, 1, 1)]
    assert bpe_train(spark, source="_dry_docs").collect() == []

    # the unrolled SQL forms (both dialects) agree
    assert spark.sql(bpe_train_sql("spark", source="_dry_docs")).collect() == []
    sql_audit = spark.sql(bpe_apply_sql("spark", source="_dry_docs")).collect()
    assert [(r.doc_id, r.n_toks_before, r.n_toks_after) for r in sql_audit] == [
        (1, 1, 1), (2, 0, 0), (3, 1, 1)]
    con = duckdb.connect()
    con.execute("CREATE VIEW _dry_docs AS SELECT * FROM (VALUES "
                "(1, ['a']), (2, CAST([] AS VARCHAR[])), (3, ['b'])) "
                "t(doc_id, toks)")
    assert con.execute(bpe_train_sql("duckdb", source="_dry_docs")).fetchall() == []
    drows = con.execute(bpe_apply_sql("duckdb", source="_dry_docs")).fetchall()
    assert [(r[0], r[1], r[2]) for r in drows] == [(1, 1, 1), (2, 0, 0), (3, 1, 1)]
