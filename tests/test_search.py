"""Search-scoring tests: the TF-IDF query is oracle-checked by the
driver; BM25 (rows-only) is pinned here against a pure-python
recomputation from the same postings."""

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from elastic_freight_spark import registry
from elastic_freight_spark.operators.search import QUERY_TERMS
from elastic_freight_spark.session import load_tables

SF = "/root/testdata/sf0.01"


def test_bm25_matches_python_recomputation(spark):
    registry.load_all()
    docs = load_tables(spark, SF)["documents"].select("doc_id", "text").collect()

    tf = defaultdict(Counter)
    dl = {}
    for r in docs:
        toks = [t for t in r["text"].lower().split(" ") if t]
        dl[r["doc_id"]] = len(toks)
        for t in toks:
            tf[t][r["doc_id"]] += 1
    n = len(docs)
    avgdl = sum(dl.values()) / n
    k1, b = 1.2, 0.75
    scores = Counter()
    hits = Counter()
    for term in QUERY_TERMS:
        postings = tf.get(term, {})
        if not postings:
            continue
        idf = math.log(1.0 + (n - len(postings) + 0.5) / (len(postings) + 0.5))
        for d, f_td in postings.items():
            scores[d] += idf * (f_td * (k1 + 1)) / (
                f_td + k1 * (1 - b + b * dl[d] / avgdl)
            )
            hits[d] += 1

    want = sorted(
        ((round(s, 9), -d) for d, s in scores.items()), reverse=True
    )[:10]
    want_ids = [-d for _, d in want]

    got = registry.QUERIES["search_bm25_topk"](spark, SF).collect()
    got_ids = [int(r["doc_id"]) for r in got]
    assert got_ids == want_ids
    for r in got:
        assert abs(r["score"] - scores[r["doc_id"]]) < 1e-6
        assert r["n_terms_hit"] == hits[r["doc_id"]]


def test_tfidf_ranking_properties(spark):
    registry.load_all()
    rows = registry.QUERIES["search_tfidf_topk"](spark, SF).collect()
    assert len(rows) == 10
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r["score"] > 0 for r in rows)


def test_search_scoring_single_corpus_scan(spark):
    """Scale contract: scoring queries read the corpus text exactly
    once per session (the cached postings build); every per-query
    executed plan reads the cache plus at most text-free parquet
    scans (count-star N, doc_id→source). Round 1 paid 2-3 corpus
    scans per call via driver-side count()/first() pulls."""
    registry.load_all()
    from elastic_freight_spark.operators.search import indexed_postings
    from elastic_freight_spark.plans.metrics import executed_scans

    indexed_postings(spark, SF)  # the one tokenizing scan, cached
    for name in (
        "search_bm25_topk",
        "search_tfidf_topk",
        "search_significant_terms",
    ):
        df = registry.QUERIES[name](spark, SF)
        scans = executed_scans(df)
        text_scans = [s for s in scans if "text" in s]
        assert not text_scans, f"{name} re-reads corpus text: {text_scans}"
        assert df.count() > 0

    # phrase match keeps its own positional pass: exactly one
    # text-reading scan executes
    dfp = registry.QUERIES["search_phrase_match"](spark, SF)
    text_scans = [s for s in executed_scans(dfp) if "text" in s]
    assert len(text_scans) == 1, text_scans


def test_search_scorer_agreement_matches_python_recompute(spark):
    """Recompute tf-vs-BM25 top-10 agreement per term in plain Python
    (same tokenizer, same k1/b, same tie-breaks)."""
    from collections import Counter, defaultdict

    from elastic_freight_spark import registry
    from elastic_freight_spark.operators.search import AGREEMENT_TERMS
    from elastic_freight_spark.session import load_tables

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    got = {
        r["token"]: (r["n_overlap"], r["footrule"])
        for r in registry.QUERIES["search_scorer_agreement"](spark, sf).collect()
    }
    tf = defaultdict(Counter)  # token -> {doc: tf}
    dl = Counter()
    for row in load_tables(spark, sf)["documents"].collect():
        toks = [t for t in row["text"].lower().split(" ") if t]
        dl[row["doc_id"]] = len(toks)
        for t, n in Counter(toks).items():
            tf[t][row["doc_id"]] += n
    avgdl = sum(dl.values()) / len(dl)
    k1, b = 1.2, 0.75
    want = {}
    for term in AGREEMENT_TERMS:
        docs = sorted(tf[term])
        r_tf = {
            d: i + 1
            for i, d in enumerate(
                sorted(docs, key=lambda d: (-tf[term][d], d))
            )
        }
        r_bm = {
            d: i + 1
            for i, d in enumerate(
                sorted(
                    docs,
                    key=lambda d: (
                        -(
                            tf[term][d]
                            * (k1 + 1)
                            / (
                                tf[term][d]
                                + k1 * (1 - b + b * dl[d] / avgdl)
                            )
                        ),
                        d,
                    ),
                )
            )
        }
        shared = [d for d in docs if r_tf[d] <= 10 and r_bm[d] <= 10]
        want[term] = (
            len(shared),
            sum(abs(r_tf[d] - r_bm[d]) for d in shared),
        )
    assert got == want


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_search_fuzzy_suggest_matches_python_recompute(spark):
    """Recompute the fuzzy suggester with a plain-Python Levenshtein
    DP over the tokenized corpus vocabulary."""
    from collections import defaultdict

    from elastic_freight_spark import registry
    from elastic_freight_spark.operators.search import SUGGEST_QUERIES
    from elastic_freight_spark.session import load_tables

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    got = defaultdict(list)
    for r in registry.QUERIES["search_fuzzy_suggest"](spark, sf).collect():
        got[r["query_term"]].append((r["suggestion"], r["distance"], r["df"]))
    vocab = defaultdict(set)
    for row in load_tables(spark, sf)["documents"].collect():
        for t in row["text"].lower().split(" "):
            if t:
                vocab[t].add(row["doc_id"])
    want = defaultdict(list)
    for q in SUGGEST_QUERIES:
        cand = [
            (d, -len(docs), tok)
            for tok, docs in vocab.items()
            if tok != q and (d := _lev(tok, q)) <= 2
        ]
        for d, negdf, tok in sorted(cand)[:3]:
            want[q].append((tok, d, -negdf))
    assert dict(got) == dict(want)


def test_search_more_like_this_scores_docs_sharing_seed_terms(spark):
    """The MLT result must exclude the seed doc, rank by descending
    score, and every hit must share at least one of the seed's
    top-tf·idf terms (seed set recomputed in Python)."""
    import math
    from collections import Counter, defaultdict

    from elastic_freight_spark import registry
    from elastic_freight_spark.operators.search import (
        MLT_SEED_DOC,
        MLT_SEED_TERMS,
    )
    from elastic_freight_spark.session import load_tables

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    rows = registry.QUERIES["search_more_like_this"](spark, sf).collect()
    assert 0 < len(rows) <= 10
    assert all(r["doc_id"] != MLT_SEED_DOC for r in rows)
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    texts = {
        r["doc_id"]: [t for t in r["text"].lower().split(" ") if t]
        for r in load_tables(spark, sf)["documents"].collect()
    }
    df = defaultdict(int)
    for toks in texts.values():
        for t in set(toks):
            df[t] += 1
    n = len(texts)
    seed_tf = Counter(texts[MLT_SEED_DOC])
    seed = {
        tok
        for _, tok in sorted(
            ((-tf * math.log(n / df[tok]), tok) for tok, tf in seed_tf.items())
        )[:MLT_SEED_TERMS]
    }
    for r in rows:
        hits = seed & set(texts[r["doc_id"]])
        assert hits, r
        assert r["n_terms_hit"] == len(hits)


def test_search_bool_query_clause_semantics(spark):
    """Every hit must contain all must terms and no must_not term;
    should terms only boost (hits without them allowed); n_terms_hit
    counts distinct must+should terms present."""
    from elastic_freight_spark import registry
    from elastic_freight_spark.operators.search import (
        BOOL_MUST,
        BOOL_MUST_NOT,
        BOOL_SHOULD,
    )
    from elastic_freight_spark.session import load_tables

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    rows = registry.QUERIES["search_bool_query"](spark, sf).collect()
    assert rows
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    texts = {
        r["doc_id"]: set(t for t in r["text"].lower().split(" ") if t)
        for r in load_tables(spark, sf)["documents"].collect()
    }
    for r in rows:
        toks = texts[r["doc_id"]]
        assert all(t in toks for t in BOOL_MUST)
        assert not any(t in toks for t in BOOL_MUST_NOT)
        assert r["n_terms_hit"] == len(
            toks & set(BOOL_MUST + BOOL_SHOULD)
        )
