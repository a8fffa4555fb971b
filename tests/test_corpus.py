"""Corpus-cleaning operator tests: line-level boilerplate removal and
Gopher-style quality signals."""

import pytest
from pyspark.sql import functions as F

from dqx_spark.pipeline import corpus


@pytest.fixture()
def docs(spark):
    rows = [
        (0, "COOKIE BANNER\nreal content zero\nFOOTER"),
        (1, "COOKIE BANNER\nreal content one\nFOOTER"),
        (2, "COOKIE BANNER\nreal content two\nFOOTER"),
        (3, "unique doc\n- bullet a\n- bullet b\nplain line\nplain line"),
        (4, ""),
        (5, None),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_line_doc_frequency(spark, docs):
    freq = {r.line: r.doc_freq for r in corpus.line_doc_frequency(docs, "doc_id", "text").collect()}
    assert freq["COOKIE BANNER"] == 3
    assert freq["FOOTER"] == 3
    assert freq["real content zero"] == 1
    # within-doc repeats count once per doc
    assert freq["plain line"] == 1


def test_remove_boilerplate_lines(spark, docs):
    out = corpus.remove_boilerplate_lines(docs, "doc_id", "text", max_line_doc_freq=2)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[0].text_clean == "real content zero"
    assert rows[0].removed_line_count == 2
    # untouched doc keeps all lines in order
    assert rows[3].text_clean == "unique doc\n- bullet a\n- bullet b\nplain line\nplain line"
    assert rows[3].removed_line_count == 0
    # empty + null docs survive with empty output
    assert rows[4].text_clean == "" and rows[4].removed_line_count == 0
    assert rows[5].text_clean == "" and rows[5].removed_line_count == 0
    # original columns are preserved
    assert set(out.columns) == {"doc_id", "text", "text_clean", "removed_line_count"}


def test_min_line_chars_keeps_short_lines(spark):
    rows = [(i, "Yes\nbody text " + str(i)) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = corpus.remove_boilerplate_lines(df, "doc_id", "text", max_line_doc_freq=2, min_line_chars=10)
    assert all(r.text_clean.startswith("Yes") for r in out.collect())


def test_gopher_signals(spark, docs):
    sig = {r.doc_id: r.g for r in docs.select("doc_id", corpus.gopher_signals("text").alias("g")).collect()}
    g3 = sig[3]
    assert g3.word_count == 12
    assert abs(g3.duplicate_line_fraction - 0.2) < 1e-9  # 1 dup of 5 lines
    assert abs(g3.bullet_line_fraction - 0.4) < 1e-9  # 2 bullets of 5 lines
    assert g3.alpha_word_fraction > 0.8
    # degenerate inputs yield zeros, not nulls/errors
    for d in (4, 5):
        assert sig[d].word_count == 0
        assert sig[d].mean_word_length == 0.0


def test_symbol_to_word_ratio(spark):
    df = spark.createDataFrame([(0, "a b c # … and now...")], "id int, t string")
    r = df.select(corpus.symbol_to_word_ratio("t").alias("s")).collect()[0].s
    # 3 symbols (one '#', one '…', one '...') / 7 whitespace tokens
    assert abs(r - 3 / 7) < 1e-9


def test_top_ngram_coverage(spark, docs):
    cov = {r.id: r for r in corpus.top_ngram_coverage(docs, "doc_id", "text", n=2).collect()}
    # doc 3: "plain line" bigram occurs twice of 11 bigrams
    assert cov[3].top_ngram_count == 2
    assert cov[3].total_ngrams == 11
    assert abs(cov[3].coverage - 2 / 11) < 1e-9
    # short/empty docs come back with zero coverage rather than dropping out
    assert cov[4].total_ngrams == 0 and cov[4].coverage == 0.0
    assert cov[5].total_ngrams == 0


def test_gopher_counts(spark, docs):
    gc = {r.doc_id: r.g for r in docs.select("doc_id", corpus.gopher_counts("text").alias("g")).collect()}
    g3 = gc[3]
    assert g3.line_count == 5 and g3.distinct_line_count == 4
    assert g3.bullet_lines == 2 and g3.word_count == 12
    assert g3.line_chars - g3.distinct_line_chars == len("plain line")
    # empty and null docs yield all-zero counts
    assert all(v == 0 for v in gc[4].asDict().values())
    assert all(v == 0 for v in gc[5].asDict().values())
    ell = spark.createDataFrame(
        [(0, "wait for it...\nmore… text ## here.....")], "doc_id int, text string"
    ).select(corpus.gopher_counts("text").alias("g")).collect()[0].g
    assert ell.ellipsis_lines == 2  # both lines end in a '...' run
    assert ell.hash_count == 2 and ell.unicode_ellipsis_count == 1
    assert ell.dots_run_count == 2  # '.....'->1 run of 3 + '...' = 2 non-overlapping


def test_clean_corpus_end_to_end(spark):
    from dqx_spark.pipeline import corpus as C_

    banner = "SHARED COOKIE BANNER LINE"
    good = "the quick brown fox jumps over the lazy dog and runs away tonight with style"
    rows = [
        (0, f"{banner}\n{good}"),
        (1, f"{banner}\n{good} extra words here today"),   # near-dup of 0 pre-banner-strip
        (2, f"{banner}\nshort"),                            # too few words after cleaning
        (3, f"{banner}\n{good}"),                           # exact dup of 0 after cleaning
        (4, f"{banner}\n### ### ### ### ### symbols {good}"),  # symbol ratio zero'd by threshold
        (5, f"{banner}\nder schnelle braune fuchs springt uber den faulen hund und rennt heute weg"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = C_.clean_corpus(
        df,
        "doc_id",
        "text",
        languages=["en"],
        min_words=5,
        max_symbol_to_word_ratio=0.05,
        boilerplate_max_line_doc_freq=2,
        splits={"train": 0.9, "val": 0.1},
    )
    rows_out = out.collect()
    kept = {r["doc_id"] for r in rows_out}
    # 2 too short, 3 exact-dup of 0, 4 symbol-heavy, 5 German
    assert kept == {0, 1}
    assert all(r["split"] in ("train", "val") for r in rows_out)
    assert all(banner not in r["text_clean"] for r in rows_out)
    assert all(r["removed_line_count"] == 1 for r in rows_out)


def test_remove_repeated_lines(spark):
    df = spark.createDataFrame(
        [
            (0, "a\nb\na\nc\nb\na"),
            (1, "x\n\n  \nx"),   # blank/whitespace lines dropped by line split
            (2, ""),
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.t for r in df.select("doc_id", corpus.remove_repeated_lines("text").alias("t")).collect()}
    assert out[0] == "a\nb\nc"  # first occurrences, original order
    assert out[1] == "x"
    assert out[2] == "" and out[3] == ""


def test_clean_corpus_normalize_stage(spark):
    rows = [
        (i, "the quick brown fox jumps over the lazy dog runs far tonight num%d  \t extra   spaces" % i)
        for i in range(20)
    ]
    rows.append((100, "the\x07 quick brown fox jumps over the lazy dog runs far tonight num0  \t extra   spaces"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = corpus.clean_corpus(df, "doc_id", "text", min_words=5, normalize=True)
    # after control-strip + whitespace collapse, doc 100 becomes an exact
    # duplicate of doc 0 and the min-id survivor wins
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert 0 in ids and 100 not in ids
    assert len(ids) == 20


def test_clean_corpus_fuzzy_decontamination_stage(spark):
    from dqx_spark.pipeline import corpus as C_

    eval_doc = "the capital of france is paris and the capital of spain is madrid ok"
    rows = [
        # near-copy of the eval doc: exact 8-gram contamination is below the
        # 0.5 threshold trip... ensure it survives exact but dies fuzzy
        (0, eval_doc.replace("ok", "yes")),
        (1, "spark dataframes shuffle partitions broadcast joins and adaptive execution plans"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ev = spark.createDataFrame([(100, eval_doc)], "doc_id long, text string")
    base_kw = dict(
        min_words=3, max_symbol_to_word_ratio=1.0, min_alpha_word_fraction=0.0,
        eval_df=ev, contamination_threshold=0.99, contamination_n=8,
    )
    # without the fuzzy stage the near-copy slips through exact decontamination
    kept = {r.doc_id for r in C_.clean_corpus(df, "doc_id", "text", **base_kw).select("doc_id").collect()}
    assert kept == {0, 1}
    # with it, only the clean doc survives
    kept = {
        r.doc_id
        for r in C_.clean_corpus(df, "doc_id", "text", fuzzy_contamination_threshold=0.5, **base_kw)
        .select("doc_id")
        .collect()
    }
    assert kept == {1}


def test_bigram_lm_scores(spark):
    """Corpus-trained bigram LM (CCNet-style perplexity filtering without
    KenLM): hand-computed add-k probabilities on a 3-doc corpus, plus the
    ordering property — a document of corpus-typical transitions scores
    LOWER than one full of unique transitions."""
    import math

    from dqx_spark.pipeline import corpus

    docs = spark.createDataFrame(
        [
            (0, "the cat sat"),
            (1, "the cat ran"),
            (2, "zq"),            # 1 token: no bigrams -> null score
            (3, None),            # null text
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in corpus.bigram_lm_scores(docs, "doc_id", "text", k=0.5).collect()}
    assert out[2]["n_bigrams"] == 0 and out[2]["avg_neg_logprob"] is None
    assert out[3]["n_bigrams"] == 0 and out[3]["avg_neg_logprob"] is None
    # corpus stats: bigrams = (the,cat)x2, (cat,sat), (cat,ran);
    # prefixes: the->2, cat->2; vocab = {the,cat,sat,ran,zq} -> V=5, k=0.5
    V, k = 5.0, 0.5
    p_the_cat = (2 + k) / (2 + k * V)
    p_cat_sat = (1 + k) / (2 + k * V)
    expected0 = -(math.log(p_the_cat) + math.log(p_cat_sat)) / 2
    assert out[0]["n_bigrams"] == 2
    assert abs(out[0]["avg_neg_logprob"] - expected0) < 1e-9
    # doc 0 and doc 1 are symmetric (sat/ran both occur once)
    assert abs(out[0]["avg_neg_logprob"] - out[1]["avg_neg_logprob"]) < 1e-9

    # ordering: repeated typical text scores lower than unique-word noise
    big = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(20)]
        + [(100, "qq ww ee rr tt yy uu ii")],
        "doc_id long, text string",
    )
    sc = {r["id"]: r["avg_neg_logprob"] for r in corpus.bigram_lm_scores(big, "doc_id", "text").collect()}
    assert sc[0] < sc[100]


def test_nb_classifier_scores(spark):
    """Multinomial NB with add-k smoothing: hand-computed log posteriors
    on a 2-class corpus, margin/tie semantics, zero-token prior-only
    scoring, and train/score separation."""
    import math

    from dqx_spark.pipeline import corpus

    train = spark.createDataFrame(
        [
            (0, "good great good", "pos"),
            (1, "good nice", "pos"),
            (2, "bad awful bad", "neg"),
            (3, "terrible", "neg"),
            (4, "ignored", None),  # null label excluded from training
        ],
        "doc_id long, text string, lab string",
    )
    score_df = spark.createDataFrame(
        [(10, "good good"), (11, "awful"), (12, "")],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r
        for r in corpus.nb_classifier_scores(
            score_df, "doc_id", "text", "lab", k=1.0, train=train
        ).collect()
    }
    # corpus stats: V=6 (good, great, nice, bad, awful, terrible);
    # pos tokens=5, neg tokens=4
    V = 6.0
    logprior = math.log(2.0 / 4.0)  # both classes: 2 of 4 labeled docs
    p_good_pos = math.log((3 + 1) / (5 + V))
    p_good_neg = math.log((0 + 1) / (4 + V))
    s_pos = logprior + 2 * p_good_pos
    s_neg = logprior + 2 * p_good_neg
    assert out[10]["predicted"] == "pos"
    assert abs(out[10]["log_posterior"] - s_pos) < 1e-9
    assert abs(out[10]["margin"] - (s_pos - s_neg)) < 1e-9
    assert out[11]["predicted"] == "neg" and out[11]["margin"] > 0
    # zero-token doc: prior-only -> equal scores, tie breaks to smaller label
    assert out[12]["predicted"] == "neg"
    assert abs(out[12]["log_posterior"] - logprior) < 1e-9
    assert abs(out[12]["margin"]) < 1e-9


def test_nb_classifier_self_train_language_id(spark):
    """Self-trained on weak labels, the classifier recovers the labels of
    held-in docs and generalizes to unseen same-language text."""
    from dqx_spark.pipeline import corpus

    rows = [(i, "the cat sat on the mat with the dog", "en") for i in range(10)]
    rows += [(100 + i, "der hund sitzt auf der matte mit der katze", "de") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["id"]: r["predicted"] for r in corpus.nb_classifier_scores(df, "doc_id", "text", "lang").collect()}
    assert all(out[i] == "en" for i in range(10))
    assert all(out[100 + i] == "de" for i in range(10))
    unseen = spark.createDataFrame(
        [(1, "the dog sat with the cat"), (2, "der katze mit der hund")],
        "doc_id long, text string",
    )
    gen = {
        r["id"]: r["predicted"]
        for r in corpus.nb_classifier_scores(unseen, "doc_id", "text", "lang", train=df).collect()
    }
    assert gen == {1: "en", 2: "de"}


def test_nb_classifier_tokenless_class_still_scores(spark):
    """A class trained only on zero-token docs keeps its prior and the
    smoothed floor instead of silently vanishing from the prediction
    space (r6 review fix)."""
    import math

    from dqx_spark.pipeline import corpus

    train = spark.createDataFrame(
        [(1, "", "spam"), (2, "good text", "ham")],
        "doc_id long, text string, lab string",
    )
    out = {
        r["id"]: r
        for r in corpus.nb_classifier_scores(
            spark.createDataFrame([(10, "novel words"), (11, "")], "doc_id long, text string"),
            "doc_id", "text", "lab", k=1.0, train=train,
        ).collect()
    }
    # both classes present: margin is non-null for every doc
    assert out[10]["margin"] is not None and out[11]["margin"] is not None
    # V=2 (good, text); spam floor per unseen token: ln(1/(0+2)); ham: ln(1/(2+2))
    logprior = math.log(0.5)
    s_spam = logprior + 2 * math.log(1.0 / 2.0)
    s_ham = logprior + 2 * math.log(1.0 / 4.0)
    assert out[10]["predicted"] == "spam"  # smaller denominator wins on unseen words
    assert abs(out[10]["log_posterior"] - s_spam) < 1e-9
    assert abs(out[10]["margin"] - (s_spam - s_ham)) < 1e-9
    # zero-token doc: prior-only tie, breaks to smaller label
    assert out[11]["predicted"] == "ham" and abs(out[11]["margin"]) < 1e-9


def test_nb_classifier_duplicate_ids_merge_with_true_margin(spark):
    """Rows sharing an id merge into one logical doc and the margin stays
    the true runner-up gap, never a spurious self-tie (r6 review fix)."""
    from dqx_spark.pipeline import corpus

    train = spark.createDataFrame(
        [(0, "good great", "pos"), (1, "bad awful", "neg")],
        "doc_id long, text string, lab string",
    )
    dup = spark.createDataFrame(
        [(7, "good good"), (7, "good great"), (8, "bad")],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in corpus.nb_classifier_scores(dup, "doc_id", "text", "lab", train=train).collect()}
    assert len(out) == 2  # one row per id
    assert out[7]["predicted"] == "pos" and out[7]["margin"] > 0
    assert out[8]["predicted"] == "neg" and out[8]["margin"] > 0
    # merged doc scores over the union of its 4 token occurrences
    # (3x good + 1x great; c(good,pos)=c(great,pos)=1, ct_pos=2, V=4)
    import math
    V, k = 4.0, 1.0
    s_pos = math.log(0.5) + 4 * math.log((1 + k) / (2 + k * V))
    assert abs(out[7]["log_posterior"] - s_pos) < 1e-9


def test_c4_signals(spark):
    """r7: the public C4 line-level cleaning heuristics, hand-counted."""
    from dqx_spark.pipeline import corpus
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (0, 'Good long sentence line here ok.\nshort one\nEnds with quote."\nuses JavaScript menus\n{ code }'),
            (1, "Lorem Ipsum dolor sit amet and then some more words here"),
            (2, None),
        ],
        "id long, text string",
    )
    out = {r["id"]: r["c"] for r in df.select("id", corpus.c4_signals("text").alias("c")).collect()}
    c = out[0]
    assert c["terminal_punct_lines"] == 2  # '.' line and '"' line
    assert c["short_lines"] == 4  # all but the 6-word first line have < 5 words
    assert c["javascript_lines"] == 1
    assert not c["has_lorem_ipsum"] and c["has_curly_brace"]
    assert out[1]["has_lorem_ipsum"] and not out[1]["has_curly_brace"]
    assert out[2]["terminal_punct_lines"] == 0 and out[2]["short_lines"] == 0


def test_blocklist_signals_and_filter(spark):
    """r8: C4 banned-word filter — whole-word + phrase matching, counts
    not verdicts, null text safe, portable pattern builder validated."""
    import pytest

    from dqx_spark.pipeline import corpus as cp

    rows = [
        (0, "the quick brown fox"),              # clean
        (1, "a BAD word and a bad phrase here"), # 2 hits (case-folded)
        (2, "badge is not a bad-word hit"),      # \b: 'badge' no, 'bad-word'... 'bad' bounded by '-' DOES hit
        (3, "multi word phrase spans here"),     # phrase term
        (4, None),                               # null-safe
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    terms = ["bad", "word phrase spans"]
    out = {r["id"]: r for r in cp.blocklist_signals(df, "id", "text", terms).collect()}
    assert out[0]["blocklist_hits"] == 0 and not out[0]["has_blocklisted"]
    assert out[1]["blocklist_hits"] == 2 and out[1]["has_blocklisted"]
    # 'badge' does not match; 'bad-word' contains whole word 'bad'
    assert out[2]["blocklist_hits"] == 1
    assert out[3]["blocklist_hits"] == 1  # the phrase term
    assert out[4]["blocklist_hits"] == 0 and not out[4]["has_blocklisted"]

    kept = {r["id"] for r in cp.blocklist_filter(df, "text", terms).collect()}
    assert kept == {0, 4}

    # regex metacharacters in terms are literal
    mdf = spark.createDataFrame([(0, "cost is $5.99 total"), (1, "cost is $5X99")], "id long, text string")
    m = {r["id"]: r["blocklist_hits"] for r in cp.blocklist_signals(mdf, "id", "text", ["$5.99"]).collect()}
    assert m[0] == 1 and m[1] == 0

    # phrases match across any whitespace run (line wrap, doubled space)
    pdf = spark.createDataFrame(
        [(0, "word phrase\nspans lines"), (1, "word  phrase  spans twice")],
        "id long, text string",
    )
    ph = {r["id"]: r["blocklist_hits"] for r in cp.blocklist_signals(pdf, "id", "text", ["phrase spans"]).collect()}
    assert ph[0] == 1 and ph[1] == 1

    # pattern builder is the shared single source and validates input
    assert cp.blocklist_pattern(["a b", "c"]) == r"(?:\ba[ \t\r\n]+b\b|\bc\b)"
    # \b anchors only on ASCII word chars — both engines define \b that
    # way, so a non-ASCII-edged term goes unanchored on that side
    assert cp.blocklist_pattern(["éclair"]) == "(?:éclair\\b)"  # é edge unanchored, r edge anchored
    with pytest.raises(ValueError, match="non-empty"):
        cp.blocklist_pattern([])
    with pytest.raises(ValueError, match="non-empty"):
        cp.blocklist_pattern(["ok", "  "])


def test_token_distribution_divergence(spark):
    """r8: Jensen-Shannon corpus shift — identical corpora give exactly
    0, disjoint vocabularies give exactly ln 2, and a hand-computable
    asymmetric case matches the closed form."""
    import math

    a = spark.createDataFrame([(0, "x x y")], "id long, t string")
    same = corpus.token_distribution_divergence(a, a, "t").collect()[0]
    assert same["js_divergence"] == 0.0
    assert same["n_tokens_a"] == 3 and same["vocab_a"] == 2 and same["vocab_union"] == 2

    b = spark.createDataFrame([(0, "p q r")], "id long, t string")
    disj = corpus.token_distribution_divergence(a, b, "t").collect()[0]
    assert abs(disj["js_divergence"] - math.log(2)) < 1e-12
    assert disj["vocab_union"] == 5

    # hand case: A = {x:1}, B = {x:1, y:1} -> p_a(x)=1, p_b=.5/.5
    c = spark.createDataFrame([(0, "X")], "id long, t string")  # lowercased
    d = spark.createDataFrame([(0, "x y")], "id long, t string")
    r = corpus.token_distribution_divergence(c, d, "t").collect()[0]
    kl_a = 1.0 * math.log(1.0 / 0.75)
    kl_b = 0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25)
    assert abs(r["kl_a_m"] - kl_a) < 1e-12
    assert abs(r["kl_b_m"] - kl_b) < 1e-12
    assert abs(r["js_divergence"] - (kl_a + kl_b) / 2) < 1e-12


def test_token_distribution_divergence_degenerate(spark):
    """r8 review: an empty side is the zero measure -> its KL half is an
    empty sum (0), the populated side contributes its full ln 2, and
    js = ln(2)/2 — a defined value far above any same-corpus js, never a
    NULL cascade."""
    import math

    a = spark.createDataFrame([(0, "x x y")], "id long, t string")
    empty = spark.createDataFrame([(0, ""), (1, None)], "id long, t string")
    r = corpus.token_distribution_divergence(empty, a, "t").collect()[0]
    assert r["n_tokens_a"] == 0 and r["vocab_a"] == 0 and r["vocab_union"] == 2
    assert r["kl_a_m"] == 0.0
    assert abs(r["kl_b_m"] - math.log(2)) < 1e-12
    assert abs(r["js_divergence"] - math.log(2) / 2) < 1e-12


def test_token_divergence_from_merged_states(spark, tmp_path):
    """r10: the incremental form — per-batch (tok, c) states persisted and
    merged reproduce the composed report exactly (ints bit-equal, JS to
    float-sum-order tolerance), so batch-vs-corpus divergence monitoring
    never rescans corpus text."""
    from dqx_spark.pipeline import sketches as SK
    from dqx_spark.pipeline.corpus import (
        merge_token_counts,
        token_count_state,
        token_distribution_divergence,
        token_distribution_divergence_from_states,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.where(F.col("doc_id") % 2 == 1)
    composed = token_distribution_divergence(a, b, "text").collect()[0]

    # corpus A arrives as three batches whose states persist individually
    path = str(tmp_path / "tok_a")
    for i in range(3):
        SK.save_sketch(
            token_count_state(a.where(F.col("doc_id") % 3 == i), "text"),
            path, "tokens", {"col": "text", "lowercase": True},
            mode="append" if i else "overwrite",
        )
    loaded, meta = SK.load_sketch(spark, path)
    assert meta == {"kind": "tokens", "col": "text", "lowercase": True}
    state_a = merge_token_counts(loaded)
    state_b = token_count_state(b, "text")
    incr = token_distribution_divergence_from_states(state_a, state_b).collect()[0]

    for c in ("n_tokens_a", "n_tokens_b", "vocab_a", "vocab_b", "vocab_union"):
        assert incr[c] == composed[c], c
    assert abs(incr["js_divergence"] - composed["js_divergence"]) < 1e-12


def test_corpus_drift_report(spark):
    """r11: the composed drift dashboard — same-corpus run is the fixed
    point (JS 0, doc Jaccard 1, identical length moments); a disjoint
    snapshot shows positive divergence and zero content overlap."""
    from dqx_spark.pipeline.corpus import corpus_drift_report

    a = spark.createDataFrame(
        [(i, f"alpha beta gamma doc {i} tail words here") for i in range(30)],
        "doc_id long, text string",
    )
    same = corpus_drift_report(a, a, "text", k=64, hash_name="md5").collect()[0]
    assert same["js_divergence"] == 0.0
    assert same["doc_jaccard"] == 1.0 and same["doc_intersection"] == same["doc_union"]
    assert same["len_mean_a"] == same["len_mean_b"]
    b = spark.createDataFrame(
        [(i, f"omega psi chi document {i} completely different register") for i in range(40)],
        "doc_id long, text string",
    )
    diff = corpus_drift_report(a, b, "text", k=64, hash_name="md5").collect()[0]
    assert diff["js_divergence"] > 0.05
    assert diff["doc_jaccard"] == 0.0
    # <k docs per side -> the KMV exact branch: estimates are exact counts
    assert diff["doc_est_a"] == 30.0 and diff["doc_est_b"] == 40.0
    assert diff["n_tokens_a"] == 30 * 8 and diff["vocab_b"] > 0
