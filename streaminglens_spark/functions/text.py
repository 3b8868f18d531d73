"""Text-analysis operators over the ``documents`` table (north-star
extensions, SURVEY §2d / BASELINE.json).

All hot-path logic uses built-in higher-order functions (JVM-side,
whole-stage-codegen) -- no Python UDFs -- so these scale to 100 TB corpora.
The character-fold hash is a portable polynomial hash (base 31, mod 2^31-1)
chosen because it is bit-reproducible in any SQL engine; a production
deployment would swap in ``xxhash64`` (same shape, one builtin call).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HASH_MOD = 2_147_483_647  # 2^31 - 1

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on")

# tiny deterministic stopword lexicons for n-gram-free language ID
LANG_LEXICON = {
    "en": ("the", "and", "of", "to", "a", "is"),
    "es": ("el", "la", "de", "que", "y", "los"),
    "de": ("der", "die", "und", "das", "ist", "ein"),
    "fr": ("le", "les", "et", "des", "un", "une"),
}


def _tokens() -> F.Column:
    return F.split(F.col("text"), " ")


def char_fold_hash(col: F.Column) -> F.Column:
    """Polynomial rolling hash over the string's characters:
    ``h = (h * 31 + ascii(c)) mod (2^31 - 1)`` -- a sequential fold, so the
    result is bit-identical in Spark and DuckDB."""
    chars = F.transform(F.split(col, ""), F.ascii)  # O(n), not substr-per-char
    return F.aggregate(
        chars, F.lit(0).cast("long"), lambda acc, c: (acc * 31 + c) % HASH_MOD
    )


def text_stats(documents: DataFrame) -> DataFrame:
    """Quality-scoring statistics per document: token count, average token
    length, stopword ratio, type-token ratio."""
    toks = _tokens()
    n = F.size(toks)
    tok_len_sum = F.aggregate(
        F.transform(toks, F.length), F.lit(0).cast("long"), lambda a, x: a + x
    )
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return documents.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_txt"),
        n.cast("long").alias("n_tokens"),
        F.round(tok_len_sum / n.cast("double"), 6).alias("avg_token_len"),
        F.round(n_stop / n.cast("double"), 6).alias("stopword_ratio"),
        F.round(F.size(F.array_distinct(toks)) / n.cast("double"), 6).alias("type_token_ratio"),
    )


def token_count(documents: DataFrame) -> DataFrame:
    """Whitespace token count plus a BPE-ish regex token count
    (alnum runs -- the subword-tokenizer budget estimate)."""
    return documents.select(
        "doc_id",
        F.size(_tokens()).cast("long").alias("n_ws_tokens"),
        F.regexp_count(F.col("text"), F.lit("[a-z0-9]+")).cast("long").alias("n_re_tokens"),
    )


def doc_fingerprint(documents: DataFrame) -> DataFrame:
    """Document fingerprints: md5 (exact-dup key) + portable polynomial
    rolling hash (cheap locality-free fingerprint)."""
    return documents.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("md5_fp"),
        char_fold_hash(F.col("text")).alias("poly_fp"),
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Composite document-quality score in [0, 1] from the text statistics
    (length band + stopword presence + lexical diversity), the filter a
    training-data pipeline thresholds on.  All components are exact
    rationals rounded at the end, so the score is bit-reproducible."""
    toks = _tokens()
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_ratio = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))) / n.cast(
        "double"
    )
    ttr = F.size(F.array_distinct(toks)) / n.cast("double")
    len_score = (
        F.when((n >= 20) & (n <= 200), F.lit(1.0))
        .when(n < 20, n / F.lit(20.0))
        .otherwise(F.lit(200.0) / n)
    )
    # stopword sweet spot ~5-40%: too few = keyword spam, too many = filler
    stop_score = F.when((stop_ratio >= 0.05) & (stop_ratio <= 0.4), 1.0).otherwise(0.5)
    score = F.round((len_score * 0.4 + stop_score * 0.3 + ttr * 0.3), 6)
    return documents.select(
        "doc_id",
        F.round(len_score, 6).alias("len_score"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(ttr, 6).alias("ttr"),
        score.alias("quality"),
        (score >= 0.5).alias("keep"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Stopword-lexicon language ID: argmax of per-language lexicon hits
    (tie -> lexicographically first language; no hits -> 'und')."""
    spark = documents.sparkSession
    lex_rows = [(lang, w) for lang, words in LANG_LEXICON.items() for w in words]
    lexicon = spark.createDataFrame(lex_rows, "lex_lang string, word string")
    toks = documents.select("doc_id", F.explode(_tokens()).alias("word"))
    hits = (
        toks.join(F.broadcast(lexicon), "word")
        .groupBy("doc_id", "lex_lang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("hits").desc(), F.col("lex_lang").asc())
    best = (
        hits.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", F.col("lex_lang").alias("pred"))
    )
    return documents.select("doc_id").join(best, "doc_id", "left").select(
        "doc_id", F.coalesce("pred", F.lit("und")).alias("pred_lang")
    )


def _max_run(sorted_arr: F.Column) -> F.Column:
    """Length of the longest run of equal adjacent elements in a SORTED
    array -- i.e. the count of the most frequent element -- via one
    sequential ``F.aggregate`` fold (state: previous element, current run,
    best run).  Zero shuffle, whole-stage codegen; the per-doc array is
    bounded by document size, so this is a map-only cost at any corpus
    scale.  The fold is order-defined, hence bit-reproducible."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc: F.Column, x: F.Column) -> F.Column:
        run = F.when(acc["prev"].eqNullSafe(x), acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(sorted_arr, init, step, lambda acc: acc["best"])


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Within-document repetition metrics (round-4 extension): the
    Gopher-style repetition filters a pretraining pipeline thresholds on --
    machine-generated / boilerplate text shows up as a high duplicate-token
    fraction or one dominant n-gram.

    Per document: ``dup_token_frac`` (1 - distinct/total tokens),
    ``top_token_frac`` (count of the most frequent token / n) and
    ``top_bigram_frac`` (count of the most frequent adjacent bigram /
    (n-1); NULL for single-token docs).

    Spark shape: sort the token array once, then take the longest
    equal-run via a sequential fold (``_max_run``) -- the mode of an array
    WITHOUT explode+groupBy, so the whole operator is a zero-shuffle
    map-only projection (the 100 TB shape: repetition scoring must not
    shuffle the corpus).  Bigrams come from ``zip_with`` over the two
    offset slices.  The DuckDB oracle deliberately uses the opposite
    algorithm (explode + GROUP BY + max(count)) so the check is
    independent.  All fractions are exact rationals rounded at the end."""
    toks = _tokens()
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return documents.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round(F.lit(1.0) - F.size(F.array_distinct(toks)) / n.cast("double"), 6).alias(
            "dup_token_frac"
        ),
        F.round(_max_run(F.array_sort(toks)) / n.cast("double"), 6).alias(
            "top_token_frac"
        ),
        F.when(
            n > 1,
            F.round(_max_run(F.array_sort(bigrams)) / (n - 1).cast("double"), 6),
        ).alias("top_bigram_frac"),
    )


# --- PII redaction (round-4 extension) --------------------------------------
# The fixture corpus is synthetic word-salad with no real PII, so the
# operator is exercised over a DERIVED corpus that injects deterministic
# PII tokens (email / phone / IPv4) as a pure function of doc_id -- the
# same derived-corpus pattern as dedup's dup_corpus -- reproduced verbatim
# in the DuckDB oracle so redaction is value-checked end-to-end.

PII_EMAIL_RE = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
PII_PHONE_RE = "555-[0-9]{4}"
PII_IP_RE = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"


def pii_corpus(documents: DataFrame) -> DataFrame:
    """Deterministically inject PII-shaped tokens into the fixture corpus:
    doc_id % 3 == 0 gains an email, % 5 == 0 a 555-prefix phone number,
    % 7 == 0 an IPv4 host.  Pure integer/string arithmetic on doc_id --
    bit-identical in any engine."""
    d = F.col("doc_id")
    email = F.when(
        d % 3 == 0,
        F.concat(F.lit(" contact user"), d.cast("string"), F.lit("@example.com")),
    ).otherwise(F.lit(""))
    phone = F.when(
        d % 5 == 0, F.concat(F.lit(" call 555-"), F.lpad((d % 10000).cast("string"), 4, "0"))
    ).otherwise(F.lit(""))
    ip = F.when(
        d % 7 == 0,
        F.concat(
            F.lit(" host 10."), (d % 256).cast("string"),
            F.lit("."), (F.expr("(doc_id div 256) % 256")).cast("string"),
            F.lit("."), (d % 100).cast("string"),
        ),
    ).otherwise(F.lit(""))
    return documents.select(
        "doc_id", F.concat(F.col("text"), email, phone, ip).alias("text")
    )


def redact_expr(t: F.Column) -> F.Column:
    """The text-valued PII redaction chain (email -> ip -> phone; see
    ``pii_redact`` for order-safety) as a reusable column expression."""
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>"), PII_IP_RE, "<IP>"
        ),
        PII_PHONE_RE,
        "<PHONE>",
    )


def pii_redact(documents: DataFrame) -> DataFrame:
    """Detect and redact PII-shaped spans (email, 555-phone, IPv4) --
    map-only ``regexp_count`` + chained ``regexp_replace`` (JVM regex, no
    Python), the scrubbing pass a training-data pipeline runs over every
    document.  Replacement order is email -> ip -> phone (fixed, and safe:
    the replacement tags contain no characters the later patterns match).
    The patterns are RE2-safe (no backrefs/lookahead) so Spark's Java regex
    and DuckDB's RE2 agree; redacted text is emitted as md5 + length so the
    full scrubbed string is value-checked without shipping it.
    Returns (doc_id, n_emails, n_phones, n_ips, clean_len, clean_md5)."""
    t = F.col("text")
    clean = redact_expr(t)
    return documents.select(
        "doc_id",
        F.regexp_count(t, F.lit(PII_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PII_PHONE_RE)).cast("long").alias("n_phones"),
        F.regexp_count(t, F.lit(PII_IP_RE)).cast("long").alias("n_ips"),
        F.length(clean).cast("long").alias("clean_len"),
        F.md5(clean.cast("binary")).alias("clean_md5"),
    )


# --- boilerplate line removal (round-4 extension) ---------------------------

BOILERPLATE_MIN_DOC_FRAC = 0.05  # a line in >= 5% of docs is boilerplate


def boilerplate_corpus(documents: DataFrame) -> DataFrame:
    """Derived multi-line corpus: the fixture text becomes the middle line,
    framed by deterministically-injected boilerplate lines (copyright
    footer on even doc_ids, newsletter plug on %3, policy links on %4) --
    the repeated-chrome shape of scraped web text, as a pure function of
    doc_id (reproduced verbatim in the oracle)."""
    d = F.col("doc_id")
    parts = F.array(
        F.when(d % 2 == 0, F.lit("copyright acme corp all rights reserved")),
        F.when(d % 3 == 0, F.lit("subscribe to our newsletter for updates")),
        F.col("text"),
        F.when(d % 4 == 0, F.lit("privacy policy terms of service")),
    )
    return documents.select(
        "doc_id",
        F.array_join(F.filter(parts, lambda x: x.isNotNull()), "\n").alias("text"),
    )


def strip_boilerplate(
    documents: DataFrame, min_doc_frac: float = BOILERPLATE_MIN_DOC_FRAC
) -> DataFrame:
    """Corpus-frequency boilerplate removal (the CCNet/RefinedWeb pass):
    a LINE that appears in >= ``min_doc_frac`` of all documents is chrome,
    not content -- drop it from every document.

    Spark shape: posexplode to (doc, pos, line); ONE groupBy on the line
    string counts distinct docs per line (count(distinct doc_id) plans as
    a two-phase partial_count_distinct -- no per-line row explosion
    reaches the reduce side); frequent lines form a bounded set that is
    BROADCAST back as a left-anti join; surviving lines reassemble in
    position order via sort_array(collect_list(struct(pos, line))).  Docs
    whose every line is boilerplate survive with empty text (left join
    from the doc spine).  Returns (doc_id, n_lines, n_kept, clean_len,
    clean_md5).

    Broadcast bound (corrected per r4 advice): each frequent line needs
    >= min_doc_frac * n_docs distinct docs behind it, and a doc
    contributes each of its lines once, so the count is at most
    total-line-incidences / (min_doc_frac * n_docs) =
    **avg_lines_per_doc / min_doc_frac** -- it scales with how line-heavy
    the corpus is, NOT a corpus-size-free constant (a 1,000-line-average
    crawl at the 5% default admits up to ~20,000 frequent lines).  That is
    still broadcast-sized for real corpora (20k short strings ~ a few MB),
    and the failure mode is LOUD, not silent: an explicit broadcast hint
    past Spark's hard relation-broadcast limit fails the job with the
    size in the error, at which point raising ``min_doc_frac`` or
    switching this join to shuffle is the documented operator move."""
    rebuilt = strip_boilerplate_text(documents, min_doc_frac)
    return rebuilt.select(
        "doc_id",
        "n_lines",
        "n_kept",
        F.length("clean").cast("long").alias("clean_len"),
        F.md5(F.col("clean").cast("binary")).alias("clean_md5"),
    )


def strip_boilerplate_text(
    documents: DataFrame, min_doc_frac: float = BOILERPLATE_MIN_DOC_FRAC
) -> DataFrame:
    """Text-valued form of ``strip_boilerplate``: (doc_id, n_lines,
    n_kept, clean) with the reassembled text itself -- the composition
    building block ``corpus_pipeline`` feeds into the quality gate.
    Same plan (one count-distinct-docs groupBy, broadcast anti-join,
    positional reassembly); ``strip_boilerplate`` derives its md5/length
    digest view from this."""
    lines = documents.select(
        "doc_id", F.posexplode(F.split("text", "\n")).alias("pos", "line")
    )
    n_docs = documents.select(
        F.countDistinct("doc_id").cast("long").alias("n_docs")
    )
    freq = (
        lines.groupBy("line")
        .agg(F.countDistinct("doc_id").cast("long").alias("n_in"))
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("n_in") >= F.col("n_docs") * F.lit(min_doc_frac))
        .select("line")
    )
    kept = lines.join(F.broadcast(freq), "line", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.array_join(
            F.sort_array(F.collect_list(F.struct("pos", "line"))).line, "\n"
        ).alias("clean"),
    )
    spine = documents.select(
        "doc_id", F.size(F.split("text", "\n")).cast("long").alias("n_lines")
    )
    return spine.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
        F.coalesce("clean", F.lit("")).alias("clean"),
    )


# --- benchmark decontamination (round-4 extension) --------------------------

DECONTAM_BENCH_MOD = 17  # doc_id % 17 == 0 forms the held-out benchmark set
DECONTAM_THRESHOLD = 0.5


def _trigram_set(toks: F.Column) -> F.Column:
    """Distinct token-3-gram set of a token array (empty for < 3 tokens).
    Built from three offset slices zipped JVM-side -- no explode, no UDF."""
    n = F.size(toks)
    tri = F.zip_with(
        F.zip_with(
            F.slice(toks, 1, n - 2),
            F.slice(toks, 2, n - 2),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
        F.slice(toks, 3, n - 2),
        lambda ab, c: F.concat_ws(" ", ab, c),
    )
    return F.when(n >= 3, F.array_distinct(tri)).otherwise(
        F.array().cast("array<string>")
    )


def decontaminate(
    documents: DataFrame, threshold: float = DECONTAM_THRESHOLD
) -> DataFrame:
    """Benchmark decontamination (round-4 extension): the GPT-3/PaLM-style
    pass that removes training documents overlapping a held-out evaluation
    set, measured as token-n-gram collision (3-grams here; production uses
    8-13-grams -- same plan, longer slices).

    The benchmark set is carved deterministically from the fixture
    (``doc_id % 17 == 0``); every other document is scored by the fraction
    of its distinct trigrams that also appear in ANY benchmark document.

    Spark shape (the 100 TB contract): the benchmark n-gram set is tiny
    relative to the corpus by definition (eval sets are fixed-size; the
    corpus is 100 TB), so it is collected into a BROADCAST hash side --
    the contamination check is a map-side semi-probe over the training
    scan plus ONE groupBy(doc_id) for the hit counts.  Nothing all-pairs,
    nothing corpus-vs-corpus.
    Returns (doc_id, n_shingles, n_hits, contam_frac, flagged)."""
    tri = documents.select("doc_id", _trigram_set(_tokens()).alias("sh"))
    bench = (
        tri.filter(F.col("doc_id") % DECONTAM_BENCH_MOD == 0)
        .select(F.explode("sh").alias("g"))
        .distinct()
    )
    train = tri.filter(F.col("doc_id") % DECONTAM_BENCH_MOD != 0)
    hits = (
        train.select("doc_id", F.explode("sh").alias("g"))
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    spine = train.select("doc_id", F.size("sh").cast("long").alias("n_shingles"))
    frac = F.round(
        F.coalesce("n_hits", F.lit(0).cast("long"))
        / F.greatest(F.col("n_shingles"), F.lit(1)).cast("double"),
        6,
    )
    return spine.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.coalesce("n_hits", F.lit(0).cast("long")).alias("n_hits"),
        frac.alias("contam_frac"),
        (frac >= threshold).alias("flagged"),
    )


# --- sequence packing (round-4 extension) -----------------------------------

PACK_SEQ_LEN = 256
PACK_N_SHARDS = 8


def pack_sequences(
    documents: DataFrame,
    seq_len: int = PACK_SEQ_LEN,
    n_shards: int = PACK_N_SHARDS,
    bucket_width: int = 8192,
    tokens_col: str | None = None,
    shard_col: str | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing (round-4 extension): the step that
    turns a document corpus into fixed-length training sequences -- every
    pretraining loader concatenates documents in a deterministic order and
    slices the token stream into ``seq_len`` windows.

    Each document is assigned: its shard (``doc_id % n_shards``), its token
    offset in the shard's concatenated stream, and the first/last sequence
    ids it lands in (a document spanning a boundary is split across both --
    the standard causal-LM packing semantics).

    Spark shape (two-level since r8 -- the ``token_budget_sample``
    recipe): the r4 form ran ONE running-offset window partitioned by
    shard, which put a whole shard's rows on one reducer (1/n_shards of
    the corpus per task -- linear, but still ~12 TB per task at the 100 TB
    target with 8 shards).  Now doc_ids are cut into contiguous ranges
    (``_b = doc_id div bucket_width``; bucket id monotone in doc_id, so
    bucket order IS the per-shard concatenation order), per-(shard,
    bucket) token sums aggregate map-side, the per-shard running offset
    runs over that TINY bucket table only, and the row-level cumsum is
    partitioned by (shard, bucket) -- data-parallel everywhere; no task
    ever scans a full shard.  All arithmetic is integer and the offsets
    are bit-identical to the one-window form (offsets are nonnegative by
    construction, so floor == div; the repo's div-bucketing
    precondition); pinned in ``tests/test_extensions_r4.py``.
    Returns (doc_id, shard, n_tokens, token_offset, first_seq, last_seq,
    n_seqs).

    ``shard_col``/``order_col`` (r12, the epoch-order pack): composed
    pipelines pack the TRAINING stream, whose shard and concatenation
    order come from the epoch shuffle (``corpus_shuffle``'s round-robin
    shard + ``shuffle_pos``), not from the doc id.  Defaults keep the
    r4 contract (shard = doc_id % n_shards, order = doc_id) bit-exactly;
    ``order_col`` must be a nonnegative integer monotone in the intended
    per-shard concatenation order (the div-bucketing precondition)."""
    from pyspark.sql import Window

    # tokens_col: composed pipelines (ingest_e2e) pack documents whose
    # cleaned text exists only as a digest + token count; default counts
    # the text column's whitespace tokens
    toks = F.col(tokens_col) if tokens_col is not None else F.size(_tokens())
    shard = (
        F.col(shard_col).cast("int")
        if shard_col is not None
        else (F.col("doc_id") % n_shards).cast("int")
    )
    order = F.col(order_col) if order_col is not None else F.col("doc_id")
    base = documents.select(
        "doc_id",
        shard.alias("shard"),
        toks.cast("long").alias("n_tokens"),
        order.cast("long").alias("_ord"),
    ).withColumn("_b", F.expr(f"_ord div {int(bucket_width)}"))
    wb = Window.partitionBy("shard").orderBy("_b")
    offsets = (
        base.groupBy("shard", "_b")
        .agg(F.sum("n_tokens").alias("_bt"))
        .withColumn(
            "_before",
            F.coalesce(
                F.sum("_bt").over(wb.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0).cast("long"),
            ),
        )
        .select("shard", "_b", "_before")
    )
    wr = Window.partitionBy("shard", "_b").orderBy("_ord")
    off = (
        F.col("_before")
        + F.sum("n_tokens").over(
            wr.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - F.col("n_tokens")
    ).alias("token_offset")
    first_seq = F.floor(F.col("token_offset") / seq_len)
    last_seq = F.floor((F.col("token_offset") + F.col("n_tokens") - 1) / seq_len)
    return (
        base.join(F.broadcast(offsets), ["shard", "_b"])
        .select("doc_id", "shard", "n_tokens", off)
        .select(
            "doc_id",
            "shard",
            "n_tokens",
            "token_offset",
            first_seq.cast("long").alias("first_seq"),
            last_seq.cast("long").alias("last_seq"),
            (last_seq - first_seq + 1).cast("long").alias("n_seqs"),
        )
    )


def tf_idf_topk(documents: DataFrame, k: int = 5) -> DataFrame:
    """Per-document top-k terms by TF-IDF (round-4 extension): the inverted
    corpus statistic every retrieval / quality pipeline needs.

    Spark shape: explode to (doc, term) postings, ONE groupBy for term
    frequencies, one for document frequencies (tiny: O(vocab), broadcast
    back), then a per-doc top-k window.  At 100 TB the df table stays
    O(vocab) and broadcastable; the posting explode is the linear scan.

    Scoring: the LOG-FREE variant ``tf * N / df`` -- one division of
    exactly-computed integers, so the score is bit-identical across
    engines/partitionings (the repo's oracle-exactness rule; ``ln`` has no
    cross-engine ulp guarantee).  Relative order per document differs from
    the log form only in how strongly rare terms dominate; callers wanting
    classic idf apply ``log`` to the emitted ``n_docs/df`` ratio
    themselves.  Ties break lexicographically for determinism.
    Returns (doc_id, term, tf, df, score) with k rows per document."""
    postings = documents.select(
        "doc_id", F.explode(_tokens()).alias("term")
    ).filter(F.col("term") != "")
    tf = postings.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n_docs = documents.select(
        F.countDistinct("doc_id").cast("long").alias("n_docs")
    )
    scored = (
        tf.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round((F.col("tf") * F.col("n_docs")).cast("double") / F.col("df"), 6),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("doc_id", "term", "tf", "df", "score")
    )


# --- hashed linear quality classifier (round-5 extension) -------------------

QC_DIM = 256             # hashed feature buckets
QC_THRESHOLD_MILLI = 0   # keep iff score_milli >= this


def qc_weights(dim: int = QC_DIM) -> list[int]:
    """Deterministic placeholder weight vector in INTEGER milli-units,
    md5-derived per bucket.  A real deployment ships weights trained
    offline (fastText-style logistic over hashed n-grams); what this
    operator provides is the 100 TB-ready SCORING plumbing -- feature
    hashing, map-only sparse dot, integer-exact arithmetic -- which is
    identical whichever weights ride in the plan."""
    import hashlib

    return [
        (int(hashlib.md5(f"qcw{j}".encode()).hexdigest(), 16) % 2001) - 1000
        for j in range(dim)
    ]


def quality_classifier(
    documents: DataFrame,
    dim: int = QC_DIM,
    threshold_milli: int = QC_THRESHOLD_MILLI,
) -> DataFrame:
    """Linear quality classifier over hashed bag-of-n-grams (the
    fastText-shaped filter every pretraining pipeline runs after the
    heuristic passes): features are word UNIGRAMS plus adjacent BIGRAMS,
    hashed into ``dim`` buckets with the repo's char-fold polynomial hash;
    the document score is the sum of the bucket weights.

    Scale shape: ZERO-shuffle map-only -- the weight vector is a plan
    literal (``dim`` ints), feature hashing and the sparse dot run inside
    one projection; scoring a 100 TB corpus is exactly one scan.  Weights
    are integer milli-units and the score an exact integer sum, so
    keep/drop decisions are bit-identical across engines and
    partitionings (no sigmoid -- the logistic is monotone in the linear
    score, so thresholding the score IS thresholding the probability).
    Returns (doc_id, n_feats, score_milli, keep)."""
    feats = qc_feats_expr(F.col("text"), dim)
    score = qc_score_expr(F.col("text"), dim)
    return documents.select(
        "doc_id",
        F.size(feats).cast("long").alias("n_feats"),
        score.alias("score_milli"),
        (score >= threshold_milli).alias("keep"),
    )


def qc_feats_expr(text: F.Column, dim: int = QC_DIM) -> F.Column:
    """Hashed unigram+bigram feature-bucket array as a reusable column
    expression (see ``quality_classifier``)."""
    toks = F.split(text, " ")
    uni = F.transform(toks, lambda t: char_fold_hash(t) % dim)
    # guarded: F.sequence(1, 0) would generate a DESCENDING [1, 0], not an
    # empty list -- single-token docs must contribute zero bigrams
    bi = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: char_fold_hash(
                F.concat(
                    F.element_at(toks, i), F.lit("_"), F.element_at(toks, i + 1)
                )
            )
            % dim,
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return F.concat(uni, bi)


def qc_score_expr(text: F.Column, dim: int = QC_DIM) -> F.Column:
    """Integer milli-unit quality score as a reusable column expression --
    lets ``corpus_pipeline`` score inside the same projection that hashes
    the cleaned text (no second pass, no subtree duplication)."""
    w = F.array(*[F.lit(x).cast("long") for x in qc_weights(dim)])
    return F.aggregate(
        qc_feats_expr(text, dim),
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.element_at(w, (b + 1).cast("int")),
    )


# --- sliding-window document chunking (round-5 extension) -------------------

CHUNK_TOKENS = 64   # window size in tokens
CHUNK_STRIDE = 48   # window advance (overlap = CHUNK_TOKENS - CHUNK_STRIDE)


def chunk_documents(
    documents: DataFrame, size: int = CHUNK_TOKENS, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """Overlapping sliding-window chunking (the RAG / long-context
    pretraining splitter ``pack_sequences`` does NOT cover: packing
    concatenates across docs, chunking subdivides within one): windows of
    ``size`` tokens starting at 0, stride, 2*stride, ... -- the last
    window is the (possibly shorter) tail, and every doc emits at least
    one chunk.  Overlap ``size - stride`` preserves context across
    boundaries.

    Scale shape: one map-only projection builds the per-doc chunk array
    (integer ceil-division for the chunk count -- no floats anywhere),
    one ``posexplode`` multiplies rows by ~n/stride; no shuffle at all --
    chunking a 100 TB corpus is a scan.  Chunk identity travels as
    md5(chunk text) so downstream exact-dedup can run on chunks with the
    same machinery as docs.  Returns (doc_id, chunk_idx, start_tok,
    n_toks, chunk_md5)."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    # k_max = ceil(max(0, n - size) / stride): pure integer arithmetic;
    # truncating `div` equals floor here because the operand is >= 0
    k_max = F.expr(
        f"greatest(cast(0 as bigint), "
        f"(cast(size(split(text, ' ')) as bigint) - {size} + {stride - 1}) "
        f"div {stride})"
    )
    chunks = F.transform(
        F.sequence(F.lit(0).cast("bigint"), k_max),
        lambda k: F.struct(
            (k * stride).alias("start"),
            F.slice(toks, (k * stride + 1).cast("int"), size).alias("ctoks"),
        ),
    )
    e = documents.select(
        "doc_id", F.posexplode(chunks).alias("chunk_idx", "c")
    )
    return e.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("c.start").cast("long").alias("start_tok"),
        F.size("c.ctoks").cast("long").alias("n_toks"),
        F.md5(F.array_join("c.ctoks", " ").cast("binary")).alias("chunk_md5"),
    )


# --- chunk-level exact dedup (round-5 extension) ----------------------------

def chunk_dedup(documents: DataFrame) -> DataFrame:
    """Cross-document repeated-PASSAGE detection -- the chunk-granular
    approximation of suffix-array substring dedup (Lee et al., 2022,
    "Deduplicating Training Data Makes Language Models Better"): document-
    level dedup misses the boilerplate paragraph pasted into thousands of
    otherwise-distinct pages; hashing fixed chunks catches it with the
    exact-dedup machinery.

    Composition: ``chunk_documents`` (map-only, no shuffle) -> ONE
    hash-groupBy on chunk_md5 -- the same single-shuffle shape as
    ``dedup_exact``, now at chunk granularity.  Keeper is the smallest
    (doc_id, chunk_idx); ``dup_count`` > 1 marks a passage to drop from
    every other location.  Returns (chunk_md5, keep_doc_id,
    keep_chunk_idx, dup_count, n_toks)."""
    chunks = chunk_documents(documents)
    return chunks.groupBy("chunk_md5").agg(
        F.min(F.struct("doc_id", "chunk_idx"))["doc_id"].alias("keep_doc_id"),
        F.min(F.struct("doc_id", "chunk_idx"))["chunk_idx"].alias(
            "keep_chunk_idx"
        ),
        F.count(F.lit(1)).cast("long").alias("dup_count"),
        F.max("n_toks").cast("long").alias("n_toks"),
    )


# --- per-source corpus manifest (round-5 extension) -------------------------

def source_manifest(documents: DataFrame) -> DataFrame:
    """Per-(source, lang) corpus accounting -- the manifest every training
    run starts from (token budgets per source, mixture planning inputs,
    post-filter size tracking).  ONE groupBy with map-side partial
    aggregation; token counts are whitespace tokens (the same ruler as
    ``text_stats``).  Returns (source, lang, n_docs, n_tokens, n_chars,
    avg_doc_tokens)."""
    toks = F.size(F.split(F.col("text"), " ")).cast("long")
    return (
        documents.select("source", "lang", toks.alias("ntok"), F.length("text").cast("long").alias("nch"))
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("ntok").cast("long").alias("n_tokens"),
            F.sum("nch").cast("long").alias("n_chars"),
        )
        .withColumn(
            "avg_doc_tokens",
            F.round(F.col("n_tokens") / F.col("n_docs").cast("double"), 6),
        )
    )


# --- whitespace/control normalization (round-5 extension) --------------------

def dirty_corpus(documents: DataFrame) -> DataFrame:
    """Deterministically inject the crawl-artifact whitespace a real
    ingest sees (the ``pii_corpus`` convention: the fixture text is clean,
    so the mess is constructed, keyed on doc_id, bit-identical in any
    engine): CRLF line endings after every ' join ' token, a literal TAB
    plus doubled spaces after every ' the ' token, leading whitespace on
    even ids, a C0 control char (BEL) on ids % 3 == 0, trailing spaces on
    ids % 5 == 0.  Plain (non-regex) replace + concat only."""
    d = F.col("doc_id")
    t = F.col("text")
    t = F.replace(t, F.lit(" join "), F.lit(" join\r\n"))
    t = F.replace(t, F.lit(" the "), F.lit(" the\t  "))
    prefix = F.when(d % 2 == 0, F.lit("  \t")).otherwise(F.lit(""))
    bell = F.when(d % 3 == 0, F.lit(" \x07garbled")).otherwise(F.lit(""))
    suffix = F.when(d % 5 == 0, F.lit("   ")).otherwise(F.lit(""))
    return documents.select(
        "doc_id", F.concat(prefix, t, bell, suffix).alias("text")
    )


def normalize_expr(s: F.Column) -> F.Column:
    """The text-valued normalization chain (see ``normalize_text``) as a
    reusable column expression -- the composition building block
    ``corpus_pipeline`` chains before the redaction pass."""
    s = F.regexp_replace(s, r"\r\n?", "\n")
    s = F.regexp_replace(s, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "")
    s = F.regexp_replace(s, r"\t", " ")
    s = F.regexp_replace(s, r" +\n", "\n")
    s = F.regexp_replace(s, r"\n +", "\n")
    s = F.regexp_replace(s, r"  +", " ")
    s = F.regexp_replace(s, r"\n{3,}", "\n\n")
    return F.regexp_replace(s, r"^[ \n]+|[ \n]+$", "")


def normalize_text(documents: DataFrame) -> DataFrame:
    """Whitespace/control normalization -- the cleanup pass before any
    token-, line- or hash-based operator (dedup fingerprints, line-level
    boilerplate removal and token counts all change meaning when CRLF,
    tabs and stray control bytes survive ingest).  Chained JVM
    ``regexp_replace`` only -- map-only, zero shuffle, no Python; every
    pattern is shared Java-regex/RE2 syntax so the DuckDB oracle runs the
    SAME chain (the ``pii_redact`` precedent):

    1. CRLF / lone CR -> LF;
    2. strip C0 controls except TAB and LF (plus DEL);
    3. TAB -> space;
    4. spaces around newlines dropped;
    5. space runs -> one space;
    6. 3+ newlines -> 2 (paragraph break preserved);
    7. trim leading/trailing whitespace.

    The chain is IDEMPOTENT (pinned in tests: a second pass is the
    identity), so re-running the pass over partially-cleaned shards at
    100 TB is safe.  Returns (doc_id, raw_len, clean_len, clean_md5)."""
    s = normalize_expr(F.col("text"))
    return documents.select(
        "doc_id",
        F.length("text").cast("long").alias("raw_len"),
        F.length(s).cast("long").alias("clean_len"),
        F.md5(s.cast("binary")).alias("clean_md5"),
    )


# --- corpus vocabulary builder (round-5 extension) ---------------------------

def vocab_topk(documents: DataFrame, k: int = 200) -> DataFrame:
    """Corpus vocabulary: the ``k`` most frequent whitespace tokens with
    exact counts, ranks and cumulative coverage -- the tokenizer-training
    precursor (vocab init, coverage curves, OOV-rate planning all start
    here).

    Spark shape: one explode + one groupBy for the counts (map-side
    partial agg), then ``orderBy(...).limit(k)`` which Spark plans as
    TakeOrdered -- a DISTRIBUTED per-partition top-k + driver merge of k
    rows, never a global sort (the ``count_min_topk`` precedent).  The
    rank/cumulative window that follows runs over the k surviving rows
    only -- bounded by construction, so the single-partition window is
    fine (the bloom-pack bounded-collect precedent).  Ties break to the
    lexicographically smaller token (deterministic).  Coverage is
    emitted as exact integers (cum_count, total_count) -- callers
    divide; no float leaves the operator.  Returns (rank, token, cnt,
    cum_count, total_count)."""
    from pyspark.sql import Window

    toks = documents.select(
        F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    total = counts.agg(F.sum("cnt").cast("long").alias("total_count"))
    top = counts.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(k)
    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn(
            "cum_count",
            F.sum("cnt")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long"),
        )
        .select("rank", "token", "cnt", "cum_count", "total_count")
    )


# --- incremental boilerplate-frequency index (round-5 extension) -------------

def boilerplate_index(documents: DataFrame) -> DataFrame:
    """Per-line distinct-document counts plus the batch's doc count --
    the persistable state of corpus-frequency boilerplate removal (the
    ``minhash_index`` pattern for the chrome pass): an incremental
    pipeline appends each ingest batch's index to a store and strips
    against the MERGED counts, never rescanning earlier batches' text.
    Counts are additive across DISJOINT batches (a doc contributes each
    of its lines once, and a doc lives in exactly one batch), so the
    merge is a plain ``groupBy(line).sum`` -- ``merge_boilerplate_index``.
    Returns (line, n_in) rows; total docs ride separately (callers track
    the running doc count the same way they track the store)."""
    return (
        documents.select(
            "doc_id", F.explode(F.array_distinct(F.split("text", "\n"))).alias("line")
        )
        .groupBy("line")
        .agg(F.countDistinct("doc_id").cast("long").alias("n_in"))
    )


def merge_boilerplate_index(*indexes: DataFrame) -> DataFrame:
    """Union + re-sum: the additive merge of per-batch line indexes."""
    if not indexes:
        raise ValueError("merge_boilerplate_index needs at least one index")
    all_idx = indexes[0]
    for t in indexes[1:]:
        all_idx = all_idx.unionByName(t)
    return all_idx.groupBy("line").agg(F.sum("n_in").cast("long").alias("n_in"))


def strip_boilerplate_with_index(
    documents: DataFrame,
    index: DataFrame,
    n_docs_total: int,
    min_doc_frac: float = BOILERPLATE_MIN_DOC_FRAC,
) -> DataFrame:
    """Strip using a PRE-BUILT merged index instead of re-counting the
    corpus: same output contract as ``strip_boilerplate_text``; when the
    index covers exactly the input corpus the two are bit-identical
    (pinned), and an incremental pipeline passes the merged multi-batch
    index + running doc count to strip new batches against corpus-wide
    frequencies."""
    lines = documents.select(
        "doc_id", F.posexplode(F.split("text", "\n")).alias("pos", "line")
    )
    freq = index.filter(
        F.col("n_in") >= F.lit(n_docs_total) * F.lit(min_doc_frac)
    ).select("line")
    kept = lines.join(F.broadcast(freq), "line", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.array_join(
            F.sort_array(F.collect_list(F.struct("pos", "line"))).line, "\n"
        ).alias("clean"),
    )
    spine = documents.select(
        "doc_id", F.size(F.split("text", "\n")).cast("long").alias("n_lines")
    )
    return spine.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
        F.coalesce("clean", F.lit("")).alias("clean"),
    )


def sequence_manifest(
    documents: DataFrame,
    seq_len: int = PACK_SEQ_LEN,
    n_shards: int = PACK_N_SHARDS,
    bucket_width: int = 8192,
    tokens_col: str | None = None,
    shard_col: str | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Loader-side index of the packed stream (r8): one row per (shard,
    sequence) describing exactly which documents fill it and where --
    the inverse view of ``pack_sequences`` (doc -> seqs there, seq ->
    docs here), which is what a data loader needs for random access into
    the packed corpus ("give me sequence 1234" -> read these doc spans)
    and what attribution tooling needs to map a training sequence back
    to its sources.

    Per (shard, seq_id): ``n_docs`` documents contribute, ``filled``
    tokens are occupied (== seq_len except each shard's final sequence),
    and ``docs_digest`` is the md5 of the span list
    ``doc_id:begin_in_seq:n_fill`` sorted by position -- the repo's
    digest convention (span membership value-checked without shipping a
    nested column).  One explode of each doc's [first_seq, last_seq]
    range + one groupBy; everything upstream is ``pack_sequences``'s
    two-level shape."""
    from pyspark.sql import functions as F

    packed = pack_sequences(documents, seq_len, n_shards, bucket_width,
                             tokens_col=tokens_col, shard_col=shard_col,
                             order_col=order_col)
    return manifest_from_packed(packed, seq_len)


def manifest_from_packed(packed: DataFrame, seq_len: int = PACK_SEQ_LEN):
    """``sequence_manifest``'s span-aggregation tail over an ALREADY
    PACKED table -- (doc_id, shard, n_tokens, token_offset, first_seq,
    last_seq) rows from ``pack_sequences`` or any table carrying the
    same columns (r12: the streaming loader's committed ``order`` table,
    whose spans are append-only and bit-equal to the batch pack).  One
    bounded explode + one groupBy(shard, seq_id)."""
    from pyspark.sql import functions as F

    seqs = packed.select(
        "shard",
        "doc_id",
        "n_tokens",
        "token_offset",
        F.explode(F.sequence("first_seq", "last_seq")).alias("seq_id"),
    )
    seq_start = F.col("seq_id") * seq_len
    begin = F.greatest(F.col("token_offset"), seq_start) - seq_start
    n_fill = F.least(
        F.col("token_offset") + F.col("n_tokens"), seq_start + seq_len
    ) - F.greatest(F.col("token_offset"), seq_start)
    spans = seqs.select(
        "shard",
        "seq_id",
        "doc_id",
        begin.cast("long").alias("begin"),
        n_fill.cast("long").alias("n_fill"),
    )
    digest = F.md5(
        F.concat_ws(
            ";",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("begin", "doc_id", "n_fill"))
                ),
                lambda s: F.concat_ws(
                    ":",
                    s["doc_id"].cast("string"),
                    s["begin"].cast("string"),
                    s["n_fill"].cast("string"),
                ),
            ),
        ).cast("binary")
    )
    return spans.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_fill").cast("long").alias("filled"),
        digest.alias("docs_digest"),
    )


def pack_waste(
    documents: DataFrame,
    seq_len: int = PACK_SEQ_LEN,
    n_shards: int = PACK_N_SHARDS,
    bucket_width: int = 8192,
    tokens_col: str | None = None,
    shard_col: str | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Pack-efficiency report (r12 extension): the QA table behind the
    ``seq_len``/``n_shards`` decision that ``pack_sequences`` executes --
    per shard, how much of the packed stream is real tokens vs padding,
    and how many documents straddle a sequence boundary (each straddle
    is a doc whose causal context a loader truncates mid-document).

    Per shard: ``n_docs``, ``n_tokens`` (real tokens), ``n_seqs``
    (sequences the shard occupies), ``n_straddles`` (docs spanning >= 2
    sequences), ``pad_tokens`` (the final sequence's unfilled tail --
    concat-and-chunk packing pads nowhere else), and ``pad_micro`` (the
    padded-stream waste fraction in integer micro units, half-up --
    pure-integer arithmetic, engine-exact).  Scale shape: one groupBy
    over ``pack_sequences``' output; everything upstream keeps the
    two-level recipe."""
    packed = pack_sequences(
        documents, seq_len, n_shards, bucket_width,
        tokens_col=tokens_col, shard_col=shard_col, order_col=order_col,
    )
    L = int(seq_len)
    agg = packed.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        (F.max("last_seq") + 1).cast("long").alias("n_seqs"),
        (F.sum("n_seqs") - F.count(F.lit(1)))
        .cast("long")
        .alias("n_straddles"),
    )
    pad = F.col("n_seqs") * F.lit(L) - F.col("n_tokens")
    # half-up integer micro fraction: (2*N*1e6 + D) div (2*D), N >= 0
    micro = F.expr(
        f"CAST((2 * (n_seqs * {L} - n_tokens) * 1000000"
        f" + n_seqs * {L}) div (2 * n_seqs * {L}) AS BIGINT)"
    )
    return agg.select(
        "shard",
        "n_docs",
        "n_tokens",
        "n_seqs",
        "n_straddles",
        pad.cast("long").alias("pad_tokens"),
        micro.alias("pad_micro"),
    )


# --- Gopher-style rule filter (r10 extension) --------------------------------

def gopher_counter_exprs(text: F.Column) -> dict[str, F.Column]:
    """The five Gopher rule counters as reusable column expressions
    (r12 factoring for ``source_quality_report``'s single-scan
    composition -- ``gopher_rules`` builds the identical projection)."""
    toks = F.filter(F.split(text, " "), lambda w: F.length(w) > 0)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return {
        "n_words": F.size(toks).cast("long"),
        "sum_word_len": F.aggregate(
            F.transform(toks, F.length),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ),
        "n_alpha_words": F.size(
            F.filter(toks, lambda w: w.rlike("[a-zA-Z]"))
        ).cast("long"),
        "n_stopwords": F.size(
            F.filter(toks, lambda w: F.array_contains(stop_arr, w))
        ).cast("long"),
        "n_symbol_words": F.size(
            F.filter(toks, lambda w: w.startswith("#") | w.contains("..."))
        ).cast("long"),
    }


def gopher_keep_expr(text: F.Column) -> F.Column:
    """The conjunctive Gopher keep as ONE inline expression over raw
    counters -- value-identical to ``gopher_rules``'s ``keep`` column
    (pinned by ``tests/test_source_report.py``), usable inside any
    single-scan projection."""
    c = gopher_counter_exprs(text)
    return (
        (c["n_words"] >= GOPHER_MIN_WORDS)
        & (c["n_words"] <= GOPHER_MAX_WORDS)
        & (c["sum_word_len"] >= F.lit(GOPHER_MIN_MEAN_LEN) * c["n_words"])
        & (c["sum_word_len"] <= F.lit(GOPHER_MAX_MEAN_LEN) * c["n_words"])
        & (F.lit(100) * c["n_alpha_words"] >= F.lit(GOPHER_MIN_ALPHA_PCT) * c["n_words"])
        & (c["n_stopwords"] >= GOPHER_MIN_STOPWORDS)
        & (F.lit(100) * c["n_symbol_words"] <= F.lit(GOPHER_MAX_SYMBOL_PCT) * c["n_words"])
    )


GOPHER_MIN_WORDS = 5
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN = 3      # mean word length in [3, 10] (Gopher Table A1)
GOPHER_MAX_MEAN_LEN = 10
GOPHER_MIN_ALPHA_PCT = 80    # >= 80% of words contain an alphabetic char
GOPHER_MIN_STOPWORDS = 2     # at least 2 stopword occurrences
GOPHER_MAX_SYMBOL_PCT = 10   # symbol-ish words (#, ...) <= 10% of words


def gopher_rules(documents: DataFrame) -> DataFrame:
    """Gopher-style quality rule verdicts (r10 extension): the named
    heuristic bundle of Rae et al. 2021 (Gopher, Table A1), the de-facto
    standard first-pass web filter (reused by MassiveText / Dolma /
    RefinedWeb variants), as ONE map-only projection -- per doc, each
    rule's boolean plus the conjunctive ``keep``.  The hashed-linear
    ``quality_classifier`` scores; this RULE SET explains (every verdict
    is auditable to a named rule -- the governance view a filtering run
    must ship).

    INTEGER-EXACT (the repo's oracle rule): every ratio threshold is a
    cross-multiplied integer comparison -- mean word length in [3, 10]
    is ``3*n <= sum_len <= 10*n``, the 80% alphabetic floor is
    ``10 * n_alpha >= 8 * n`` -- so no float division can flip a verdict
    between engines.  Zero shuffle: filtering 100 TB is a scan.
    Returns (doc_id, n_words, sum_word_len, n_alpha_words, n_stopwords,
    n_symbol_words, r_word_count, r_mean_len, r_alpha, r_stopwords,
    r_symbols, keep)."""
    counters = gopher_counter_exprs(F.col("text"))
    base = documents.select(
        "doc_id",
        *[expr.alias(name) for name, expr in counters.items()],
    )
    r_count = (F.col("n_words") >= GOPHER_MIN_WORDS) & (
        F.col("n_words") <= GOPHER_MAX_WORDS
    )
    r_mean = (
        F.col("sum_word_len") >= F.lit(GOPHER_MIN_MEAN_LEN) * F.col("n_words")
    ) & (F.col("sum_word_len") <= F.lit(GOPHER_MAX_MEAN_LEN) * F.col("n_words"))
    r_alpha = (
        F.lit(100) * F.col("n_alpha_words")
        >= F.lit(GOPHER_MIN_ALPHA_PCT) * F.col("n_words")
    )
    r_stop = F.col("n_stopwords") >= GOPHER_MIN_STOPWORDS
    r_sym = (
        F.lit(100) * F.col("n_symbol_words")
        <= F.lit(GOPHER_MAX_SYMBOL_PCT) * F.col("n_words")
    )
    return base.select(
        "*",
        r_count.alias("r_word_count"),
        r_mean.alias("r_mean_len"),
        r_alpha.alias("r_alpha"),
        r_stop.alias("r_stopwords"),
        r_sym.alias("r_symbols"),
        (r_count & r_mean & r_alpha & r_stop & r_sym).alias("keep"),
    )


# --- C4-style rule filter (r12 extension) ------------------------------------

C4_MIN_LINE_WORDS = 5    # a kept line has at least 5 words (C4 / Raffel 2020)
C4_MIN_SENTENCES = 3     # a kept page has at least 3 sentences


def c4_text_expr(d: F.Column, t: F.Column) -> F.Column:
    """The c4_corpus injection as a reusable column expression over
    (doc_id, text) -- shared by ``c4_corpus`` and the single-scan
    ``source_quality_report`` composition."""
    content = F.concat(
        F.replace(t, F.lit(" table "), F.lit(". table ")),
        F.lit("."),
    )
    parts = F.array(
        F.when(d % 7 == 0, F.lit("lorem ipsum dolor sit amet consectetur.")),
        F.when(d % 11 == 0, F.lit("var config = { mode: fast };")),
        F.when(d % 13 == 0, F.lit("please enable javascript to continue now.")),
        F.when(d % 2 == 0, F.lit("copyright acme corp all rights reserved")),
        content,
        F.when(d % 5 == 0, F.lit("Read more!")),
        F.when(d % 3 == 0, F.lit("This is a perfectly good sentence to keep.")),
    )
    return F.array_join(F.filter(parts, lambda x: x.isNotNull()), "\n")


def c4_corpus(documents: DataFrame) -> DataFrame:
    """Derived corpus with the crawl artifacts C4's rules exist to
    catch, injected as a pure function of doc_id (the
    ``boilerplate_corpus`` convention, reproduced verbatim in the
    oracle): a lorem-ipsum filler line on %7 ids, a curly-brace code
    line on %11, a 'please enable javascript' plea on %13, the
    unpunctuated copyright footer on %2, a too-short teaser on %5 and
    a well-formed keeper sentence on %3.  The fixture text becomes the
    content line with sentence structure added deterministically
    (a period before every ' table ' occurrence plus a terminal one),
    so the page-level sentence count varies doc to doc."""
    return documents.select(
        "doc_id",
        c4_text_expr(F.col("doc_id"), F.col("text")).alias("text"),
    )


def _c4_line_keep(line: F.Column) -> F.Column:
    """The C4 line rule as an expression (see ``c4_rules``)."""
    words = F.filter(F.split(line, " "), lambda w: F.length(w) > 0)
    terminal = (
        line.endswith(".")
        | line.endswith("!")
        | line.endswith("?")
        | line.endswith('"')
    )
    return (
        (F.size(words) >= C4_MIN_LINE_WORDS)
        & terminal
        & ~F.lower(line).contains("javascript")
    )


def c4_keep_expr(text: F.Column) -> F.Column:
    """The conjunctive C4 page keep as ONE inline expression --
    value-identical to ``c4_rules``'s ``keep`` column (pinned by
    ``tests/test_source_report.py``), usable inside any single-scan
    projection."""
    clean = F.array_join(
        F.filter(F.split(text, "\n"), _c4_line_keep), "\n"
    )
    n_sent = F.length(F.regexp_replace(clean, r"[^.!?]", ""))
    return (
        (n_sent >= C4_MIN_SENTENCES)
        & ~F.lower(text).contains("lorem ipsum")
        & ~text.contains("{")
    )


def c4_rules(documents: DataFrame) -> DataFrame:
    """C4-style cleaning verdicts (r12 extension): the line and page
    heuristics of Raffel et al. 2020 (T5's C4 corpus, section 2.2) --
    the OTHER canonical first-pass web filter next to ``gopher_rules``
    (C4 cleans line-granular where Gopher scores whole pages).  One
    map-only projection; filtering 100 TB is a scan.

    Line rule (applied first): keep a line iff it has at least
    ``C4_MIN_LINE_WORDS`` words, ends in terminal punctuation
    (``. ! ? "``), and does not mention javascript.  Page rules (on
    the cleaned page): at least ``C4_MIN_SENTENCES`` sentences
    (terminal-punctuation count over kept lines); no 'lorem ipsum';
    no curly brace (both checked on the RAW page, as C4 does --
    they signal boilerplate/code whatever the line shapes).  C4's
    badword-list rule is deliberately out of scope (the public list
    is not shipped here); its three-sentence-span dedup lives in
    ``span_dedup``.

    Everything is integer/string-exact -- word counts are nonempty
    space-splits, the sentence count is a character-class strip --
    so verdicts and the kept-page digest hash-match across engines.
    Returns (doc_id, n_lines, n_kept_lines, n_sentences, r_sentences,
    r_lorem, r_brace, keep, clean_md5)."""
    lines = F.split(F.col("text"), "\n")
    base = documents.select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        F.array_join(F.filter(lines, _c4_line_keep), "\n").alias("clean"),
        (~F.lower(F.col("text")).contains("lorem ipsum")).alias("r_lorem"),
        (~F.col("text").contains("{")).alias("r_brace"),
    )
    n_kept = F.when(
        F.length("clean") == 0, F.lit(0)
    ).otherwise(F.size(F.split(F.col("clean"), "\n")))
    n_sent = F.length(F.regexp_replace(F.col("clean"), r"[^.!?]", ""))
    base = base.select(
        "doc_id",
        "n_lines",
        n_kept.cast("long").alias("n_kept_lines"),
        n_sent.cast("long").alias("n_sentences"),
        "r_lorem",
        "r_brace",
        F.md5(F.col("clean")).alias("clean_md5"),
    )
    r_sent = F.col("n_sentences") >= C4_MIN_SENTENCES
    return base.select(
        "doc_id",
        "n_lines",
        "n_kept_lines",
        "n_sentences",
        r_sent.alias("r_sentences"),
        "r_lorem",
        "r_brace",
        (r_sent & F.col("r_lorem") & F.col("r_brace")).alias("keep"),
        "clean_md5",
    )


def source_quality_report(
    documents: DataFrame,
    threshold_milli: int = QC_THRESHOLD_MILLI,
    c4_text=None,
) -> DataFrame:
    """Per-source quality governance rollup (r12 extension): the table
    a filtering run ships upstream -- for every source, how many docs
    each of the three quality families keeps (the Gopher rule bundle,
    the C4 line+page rules, the hashed linear classifier) and how many
    survive ALL of them.

    ``c4_text`` (r12 advice): optional (doc_id, text) -> text column
    transform applied before the C4 verdict -- default ``None`` scores
    the caller's RAW corpus, which is what a real governance run wants.
    The registry's ``q_source_quality_report`` passes the fixture's
    synthetic boilerplate injection (``c4_text_expr``) explicitly so
    its oracle (which composes the injected ``q_c4_rules`` oracle)
    stays hash-exact; that injection is a fixture concern and no longer
    leaks into the exported operator.

    Spark shape: ONE corpus scan -- all three keep verdicts are pure
    per-row expressions (``gopher_keep_expr`` / ``c4_keep_expr`` /
    ``qc_score_expr``, the same expressions the per-doc audit queries
    ship, pinned value-identical by ``tests/test_source_report.py``)
    computed in a single projection -- followed by one
    map-side-combined groupBy to O(#sources) rows.  Composing the
    audited operators by doc_id joins instead would scan the corpus
    three times and shuffle it twice for the same numbers.
    Returns (source, n_docs, gopher_keep, c4_keep, clf_keep,
    all_keep)."""
    from ..plans.shape import scan_parallel

    g = gopher_keep_expr(F.col("text"))
    c4_input = (
        F.col("text")
        if c4_text is None
        else c4_text(F.col("doc_id"), F.col("text"))
    )
    c = c4_keep_expr(c4_input)
    q = qc_score_expr(F.col("text")) >= threshold_milli
    # the classifier's per-character feature hash is CPU-dense -- the
    # verdict projection must not run at single-split scan parallelism
    # (measured at sf1: 26 s single-task -> parallel)
    one = scan_parallel(
        documents.select("doc_id", "text", "source")
    ).select("source", g.alias("g"), c.alias("c"), q.alias("q"))
    return one.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("g").cast("int")).cast("long").alias("gopher_keep"),
        F.sum(F.col("c").cast("int")).cast("long").alias("c4_keep"),
        F.sum(F.col("q").cast("int")).cast("long").alias("clf_keep"),
        F.sum((F.col("g") & F.col("c") & F.col("q")).cast("int"))
        .cast("long")
        .alias("all_keep"),
    )


def line_dedup(documents: DataFrame) -> DataFrame:
    """Corpus-wide first-occurrence LINE dedup (r11 extension): every
    distinct nonempty line survives only at its earliest occurrence --
    (min doc_id, then min position) -- and every later copy is removed
    from its document.  This is the cross-document line-level pass of
    the CCNet/RefinedWeb lineage (cf. reference semantics: none -- the
    reference has no text operators; this extends the repo's
    ``strip_boilerplate``, which removes lines FREQUENT across docs,
    with the stricter keep-one-copy rule a dedup pipeline wants for
    chrome that falls under the frequency threshold).

    Scale shape -- the skew point a naive plan hits is the join back on
    the LINE content key (a mega-line present in half the corpus sends
    every occurrence to one reducer).  This plan never joins on content:
    the keeper election is ONE groupBy(line) with ``min(struct(doc_id,
    pos))`` -- partial-aggregated, so a hot line collapses to one row
    per map partition before the shuffle -- and the keeper table IS the
    kept occurrence set (exactly one row per distinct line), so
    reassembly is a groupBy(doc_id) over it plus one id-keyed left join
    for docs that lost every line.  Returns (doc_id, n_lines, n_kept,
    clean_len, clean_md5), the ``strip_boilerplate`` output convention
    (digest, not text -- the cleaned text never re-ships)."""
    lines = documents.select(
        "doc_id", F.posexplode(F.split("text", "\n")).alias("pos", "line")
    ).filter(F.length("line") > 0)
    keeper = lines.groupBy("line").agg(
        F.min(F.struct("doc_id", "pos")).alias("k")
    )
    kept = keeper.select(
        F.col("k.doc_id").alias("doc_id"),
        F.col("k.pos").alias("pos"),
        "line",
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean"),
    )
    n_lines = F.size(
        F.filter(F.split("text", "\n"), lambda x: F.length(x) > 0)
    ).cast("long")
    return (
        documents.select("doc_id", n_lines.alias("n_lines"))
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            F.coalesce(F.col("n_kept"), F.lit(0).cast("long")).alias(
                "n_kept"
            ),
            F.length(F.coalesce(F.col("clean"), F.lit("")))
            .cast("long")
            .alias("clean_len"),
            F.md5(
                F.coalesce(F.col("clean"), F.lit("")).cast("binary")
            ).alias("clean_md5"),
        )
    )
