"""Text-analysis + deduplication corpus over ``documents`` (north-star
LLM-data-pipeline operators; SURVEY §7 M5).

All token math uses single-space splitting so Spark ``split`` and
DuckDB ``string_split`` agree exactly; shingle/pair queries keep the
join keyed (doc-adjacent pairs) so the oracle stays polynomial-safe at
sf0.01 while the unkeyed LSH variants live in ``operators/dedup.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import register
from high_energy_gamma_ray_search_in_kascade_array_data_spark.sources.catalog import load_table, spread_scan


def _vec_as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _vec_sq_norm(col):
    return F.aggregate(_vec_as_double(col), F.lit(0.0), lambda acc, x: acc + x * x)


def _vec_dot(a, b):
    return F.aggregate(
        F.zip_with(_vec_as_double(a), _vec_as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _tokens(df: DataFrame) -> DataFrame:
    return df.select("doc_id", F.split(F.col("text"), " ").alias("toks"))


@register(
    "text_token_stats",
    survey_ref="M5:text",
    oracle="""
SELECT doc_id,
       CAST(LENGTH(text) AS BIGINT) AS len_chars,
       CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       ROUND((LENGTH(text) - LEN(string_split(text, ' ')) + 1) * 1.0
             / LEN(string_split(text, ' ')), 6) AS avg_token_len
FROM documents
""",
)
def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality arithmetic per document."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " "))
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("len_chars"),
        n_tok.cast("long").alias("n_tokens"),
        F.round((F.length("text") - n_tok + 1) / n_tok, 6).alias("avg_token_len"),
    )


@register(
    "word_frequency",
    survey_ref="M5:text",
    oracle="""
SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
GROUP BY tok
ORDER BY n DESC, tok
LIMIT 20
""",
)
def q_word_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequency: explode + hash aggregate + top-k."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(20)
    )


@register(
    "lang_stopword_rate",
    survey_ref="M5:text",
    oracle="""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN tok IN ('the', 'a') THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
       ROUND(SUM(CASE WHEN tok IN ('the', 'a') THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS stop_rate
FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents) t
GROUP BY lang
""",
)
def q_lang_stopword_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic primitive: per-language stopword hit rate
    (an n-gram/stopword scorer is how cheap lang-ID works at scale)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("lang", F.explode(F.split(F.col("text"), " ")).alias("tok"))
    stop_hit = F.when(F.col("tok").isin("the", "a"), 1).otherwise(0)
    return toks.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(stop_hit).alias("n_stop"),
        F.round(F.sum(stop_hit) / F.count(F.lit(1)), 6).alias("stop_rate"),
    )


@register(
    "doc_quality_score",
    survey_ref="M5:text",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct,
       ROUND(COUNT(DISTINCT tok) * 1.0 / COUNT(*), 6) AS type_token_ratio
FROM toks GROUP BY doc_id
""",
)
def q_doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: lexical diversity (type/token ratio) per doc —
    computed on the token arrays without a shuffle (array_distinct)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias("type_token_ratio"),
    )


@register(
    "lang_id_heuristic",
    survey_ref="M5:text",
    oracle="""
WITH scored AS (
  SELECT doc_id, lang,
         LEN(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) * 1.0
           / LEN(string_split(text, ' ')) AS en_score,
         LEN(list_filter(string_split(text, ' '), t -> t IN ('query', 'table', 'join'))) * 1.0
           / LEN(string_split(text, ' ')) AS tech_score
  FROM documents
)
SELECT doc_id, lang,
       ROUND(en_score, 6) AS en_score,
       ROUND(tech_score, 6) AS tech_score,
       CASE WHEN en_score >= tech_score THEN 'en' ELSE 'tech' END AS predicted
FROM scored
""",
)
def q_lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID as profile scoring: per-doc hit rates against
    per-class stopword profiles, argmax decision — the cheap lang-ID
    that works at ingest scale (the fixture's lang labels share one
    vocabulary, so the *labels* aren't recoverable; the scoring
    machinery is what this checks). Pure array ops, no explode."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    d = d.select("doc_id", "lang", toks.alias("t"))
    n = F.size("t")
    en_hits = F.size(F.filter(F.col("t"), lambda t: t.isin("the", "a")))
    tech_hits = F.size(F.filter(F.col("t"), lambda t: t.isin("query", "table", "join")))
    en_score, tech_score = en_hits / n, tech_hits / n
    return d.select(
        "doc_id",
        "lang",
        F.round(en_score, 6).alias("en_score"),
        F.round(tech_score, 6).alias("tech_score"),
        F.when(en_score >= tech_score, F.lit("en")).otherwise(F.lit("tech")).alias("predicted"),
    )


@register(
    "dedup_exact",
    survey_ref="M5:dedup,§2.10",
    oracle="""
WITH groups AS (
  SELECT text, CAST(MIN(doc_id) AS BIGINT) AS canonical_id, COUNT(*) AS n_copies
  FROM documents GROUP BY text
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_unique,
       CAST(COALESCE(SUM(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_dup_groups,
       CAST(COALESCE(SUM(n_copies - 1), 0) AS BIGINT) AS n_redundant
FROM groups
""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via hash groupBy on the full text — at scale the
    groupBy key would be xxhash64(text) to shrink shuffle payloads
    (see operators/dedup.py); counts are identical."""
    d = load_table(spark, sf_dir, "documents")
    groups = d.groupBy("text").agg(
        F.min("doc_id").alias("canonical_id"), F.count(F.lit(1)).alias("n_copies")
    )
    return groups.agg(
        F.count(F.lit(1)).alias("n_unique"),
        F.coalesce(F.sum(F.when(F.col("n_copies") > 1, 1).otherwise(0)), F.lit(0)).alias("n_dup_groups"),
        F.coalesce(F.sum(F.col("n_copies") - 1), F.lit(0)).alias("n_redundant"),
    )


@register(
    "dedup_prefix_groups",
    survey_ref="M5:dedup",
    oracle="""
WITH pfx AS (
  SELECT doc_id,
         array_to_string(string_split(text, ' ')[1:5], ' ') AS prefix
  FROM documents
)
SELECT prefix, CAST(MIN(doc_id) AS BIGINT) AS canonical_id, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM pfx GROUP BY prefix HAVING COUNT(*) > 1
""",
)
def q_dedup_prefix_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup blocking by normalized 5-token prefix: the blocking
    stage of fingerprint dedup (group → canonical id = min doc_id)."""
    d = load_table(spark, sf_dir, "documents")
    prefix = F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 5))
    return (
        d.select("doc_id", prefix.alias("prefix"))
        .groupBy("prefix")
        .agg(F.min("doc_id").alias("canonical_id"), F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )


@register(
    "ngram_jaccard_adjacent",
    survey_ref="M5:dedup",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
sh AS (
  SELECT DISTINCT t1.doc_id, t1.tok || ' ' || t2.tok || ' ' || t3.tok AS shingle
  FROM toks t1
  JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
  JOIN toks t3 ON t3.doc_id = t1.doc_id AND t3.pos = t1.pos + 2
),
counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1 AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b, CAST(c.n_common AS BIGINT) AS n_common,
       ROUND(c.n_common * 1.0 / (ca.n_sh + cb.n_sh - c.n_common), 6) AS jaccard
FROM common c
JOIN counts ca ON ca.doc_id = c.doc_a
JOIN counts cb ON cb.doc_id = c.doc_b
""",
)
def q_ngram_jaccard_adjacent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram shingle Jaccard similarity between id-adjacent document
    pairs: the verification stage of near-dup dedup (the candidate
    generation stage is MinHash-LSH, operators/dedup.py — this keyed
    variant is the oracle-checkable twin)."""
    d = load_table(spark, sf_dir, "documents")
    # Shingle-set comparison WITHOUT exploding: keep each doc's distinct
    # 3-gram shingles as an array column, equi-join the candidate pairs
    # (here: id-adjacent docs) and take size(array_intersect(...)).
    # The data volume through the join is one row per doc, not one row
    # per shingle — at 100 TB the explode+self-join alternative shuffles
    # ~50× more rows to compute the same counts. Also: materialize the
    # token array once per row first (feeding the raw split() expression
    # into element_at re-splits the text per element — measured 30×
    # slower), and repartition the single-file scan so the shingle
    # transform parallelizes.
    tok = (
        spread_scan(d)
        .select("doc_id", F.split(F.col("text"), " ").alias("t"))
        .filter(F.size("t") >= 3)
    )
    t = F.col("t")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(t) - 3),
            lambda i: F.concat_ws(
                " ",
                F.element_at(t, i + 1),
                F.element_at(t, i + 2),
                F.element_at(t, i + 3),
            ),
        )
    )
    sh = tok.select("doc_id", shingles.alias("sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    pair = a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
    n_common = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    n_union = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - n_common
    return (
        pair.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            n_common.cast("long").alias("n_common"),
            F.round(n_common / n_union, 6).alias("jaccard"),
        )
        .filter(F.col("n_common") > 0)
    )


@register(
    "doc_fingerprint",
    survey_ref="M5:text",
    oracle="""
SELECT doc_id,
       CAST(SUM(pos * LENGTH(tok)) % 1000000007 AS BIGINT) AS fingerprint
FROM (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
) t GROUP BY doc_id
""",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-weighted document fingerprint (order-sensitive rolling
    checksum): exact integer arithmetic so the oracle matches; the
    production-strength 64-bit variant (xxhash64 simhash) is in
    operators/dedup.py (rows-only check)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "tok")
    )
    return toks.groupBy("doc_id").agg(
        (F.sum((F.col("pos0") + 1) * F.length("tok")) % 1000000007).alias("fingerprint")
    )


@register(
    "tfidf_top_terms",
    survey_ref="M5:text,§2.6,§2.8",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok
),
df AS (
  SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.tok,
         tf.tf * LN((n.n_docs + 1.0) / (df.df + 1.0)) AS tfidf
  FROM tf JOIN df USING (tok), n
),
ranked AS (
  SELECT doc_id, tok, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rn
  FROM scored
)
SELECT doc_id, tok, ROUND(tfidf, 6) AS tfidf, CAST(rn AS INTEGER) AS rn
FROM ranked WHERE rn <= 3
""",
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF with top-3 terms per document: term frequency (explode +
    groupBy), document frequency (aggregate-bounded by vocabulary),
    smoothed idf, per-doc ranking window. The df relation is
    vocab-sized and broadcast back onto tf — the only event-scale
    shuffles are the two token aggregations. n_docs rides along as a
    broadcast one-row aggregate (cross join), not a separate driver
    count() action — the whole query is a single job."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    ndocs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(ndocs))
        .select(
            "doc_id",
            "tok",
            (F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "tok", F.round("tfidf", 6).alias("tfidf"), F.col("rn").cast("int").alias("rn"))
    )


@register(
    "bpe_pretokenize_counts",
    survey_ref="M5:text",
    oracle=r"""
SELECT doc_id,
       CAST(LEN(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_pieces,
       CAST(LEN(regexp_extract_all(text, '[^\w\s]')) AS BIGINT) AS n_punct,
       CAST(LEN(regexp_extract_all(text, '\d+')) AS BIGINT) AS n_numeric
FROM documents WHERE doc_id % 5 = 0
""",
)
def q_bpe_pretokenize_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-tokenizer accounting: word/punctuation piece
    counts via regex extraction (the GPT-2-ish `\\w+|[^\\w\\s]` split) —
    the token-budget estimator a training-data pipeline runs before
    the real tokenizer. Row-local regex, codegen'd, no shuffle."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(r"\w+|[^\w\s]"), F.lit(0))).cast("long").alias("n_pieces"),
        F.size(F.regexp_extract_all("text", F.lit(r"[^\w\s]"), F.lit(0))).cast("long").alias("n_punct"),
        F.size(F.regexp_extract_all("text", F.lit(r"\d+"), F.lit(0))).cast("long").alias("n_numeric"),
    )


@register(
    "doc_repetition_metrics",
    survey_ref="M5:text,§2.6",
    oracle="""
WITH lists AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
toks AS (SELECT doc_id, unnest(l) AS tok FROM lists),
counts AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
uni AS (SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n, COUNT(*) AS n_distinct
        FROM counts GROUP BY 1),
bigrams AS (SELECT doc_id, l[x] || ' ' || l[x+1] AS bg
            FROM lists, unnest(generate_series(1, len(l)-1)) AS u(x)),
bcounts AS (SELECT doc_id, bg, COUNT(*) AS c FROM bigrams GROUP BY 1, 2),
big AS (SELECT doc_id, MAX(c) AS top_bc, SUM(c) AS nb FROM bcounts GROUP BY 1)
SELECT u.doc_id,
       CAST(u.n AS BIGINT) AS n_tokens,
       ROUND(u.top_c * 1.0 / u.n, 6) AS top_unigram_frac,
       ROUND(1.0 - u.n_distinct * 1.0 / u.n, 6) AS dup_token_frac,
       ROUND(b.top_bc * 1.0 / b.nb, 6) AS top_bigram_frac
FROM uni u JOIN big b ON u.doc_id = b.doc_id
""",
)
def q_doc_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/RefinedWeb-style repetition quality signals per document:
    top-unigram fraction, duplicate-token fraction, top-bigram fraction
    — the filters a training-data pipeline applies before tokenization
    (boilerplate and degenerate repetition inflate loss). Bigrams come
    from a higher-order ``transform`` over the token array (JVM-side,
    no UDF); the only event-scale shuffles are the two gram
    aggregations, both keyed by doc_id so the final joins co-locate."""
    d = load_table(spark, sf_dir, "documents")
    lists = d.select("doc_id", F.split("text", " ").alias("l"))
    counts = (
        lists.select("doc_id", F.explode("l").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    uni = counts.groupBy("doc_id").agg(
        F.max("c").alias("top_c"),
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
    bigrams = lists.select(
        "doc_id",
        F.explode(
            F.expr("transform(slice(l, 1, size(l)-1), (t, i) -> concat(t, ' ', l[i+1]))")
        ).alias("bg"),
    )
    big = (
        bigrams.groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bc"), F.sum("c").alias("nb"))
    )
    return uni.join(big, "doc_id").select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        F.round(F.col("top_c") * 1.0 / F.col("n"), 6).alias("top_unigram_frac"),
        F.round(1.0 - F.col("n_distinct") * 1.0 / F.col("n"), 6).alias("dup_token_frac"),
        F.round(F.col("top_bc") * 1.0 / F.col("nb"), 6).alias("top_bigram_frac"),
    )


@register(
    "corpus_mix_sample",
    survey_ref="M5:text,X2,X3",
    oracle="""
WITH rates(source, rate) AS (
  VALUES ('src0', 1.0), ('src1', 0.5), ('src2', 0.25), ('src3', 0.1)
),
drawn AS (
  SELECT d.source, r.rate,
         CASE WHEN ((d.doc_id % 2147483648) * 2654435761 % 4294967296) / 4294967296.0 < r.rate
              THEN 1 ELSE 0 END AS keep
  FROM documents d JOIN rates r ON d.source = r.source
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(keep) AS BIGINT) AS n_kept
FROM drawn GROUP BY source
""",
)
def q_corpus_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture sampling: down-sample each source to a target
    rate (the data-recipe step that turns raw crawl proportions into
    the desired corpus mix) with the engine's deterministic
    Knuth-multiplicative draw — the SAME row is kept on every run, on
    any cluster, at any partitioning (X3 seeded determinism; a real
    pipeline needs resumable sampling, not rand()). Rates ride a
    broadcast VALUES relation; the draw is a row-local expression, so
    the only shuffle is the per-source count."""
    d = load_table(spark, sf_dir, "documents")
    rates = d.sparkSession.createDataFrame(
        [("src0", 1.0), ("src1", 0.5), ("src2", 0.25), ("src3", 0.1)],
        "source string, rate double",
    )
    # doc_id pre-reduced mod 2^31: the multiply stays inside int64 at
    # any corpus size (ANSI mode makes the overflow a hard error)
    rnd = (F.col("doc_id") % 2147483648) * 2654435761 % 4294967296 / F.lit(4294967296.0)
    drawn = d.join(F.broadcast(rates), "source").select(
        "source", F.when(rnd < F.col("rate"), 1).otherwise(0).alias("keep")
    )
    return drawn.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum("keep").cast("bigint").alias("n_kept"),
    )


@register(
    "decontaminate_overlap",
    survey_ref="M5:text,M5:dedup,§2.7",
    oracle="""
WITH sh AS (
  SELECT doc_id,
         list_distinct([l[x] || ' ' || l[x+1] || ' ' || l[x+2]
                        FOR x IN range(1, len(l) - 1)]) AS shingles
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
  WHERE len(l) >= 3
),
ev AS (SELECT doc_id AS eval_id, unnest(shingles) AS sg FROM sh WHERE doc_id % 97 = 0),
tr AS (SELECT doc_id, unnest(shingles) AS sg FROM sh WHERE doc_id % 97 <> 0)
SELECT tr.doc_id,
       CAST(COUNT(DISTINCT tr.sg) AS BIGINT) AS n_overlap,
       CAST(COUNT(DISTINCT ev.eval_id) AS BIGINT) AS n_eval_docs
FROM tr JOIN ev ON tr.sg = ev.sg
GROUP BY 1 HAVING COUNT(DISTINCT tr.sg) >= 2
""",
)
def q_decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing ≥2
    distinct 3-gram shingles with any held-out eval document (the
    n-gram-overlap rule of GPT-3/PaLM-style decontamination) — the
    training-data hygiene step that runs BEFORE a corpus ships. Both
    sides shingle row-locally (same transform as the dedup family),
    distinct per doc, and meet in an equi-join on the shingle string:
    pairs materialize only for shared shingles, the same bounded-join
    property LSH banding gives dedup. Shuffles: two shingle
    aggregations + the overlap join, all keyed, no cartesian."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("l")).filter(F.size("l") >= 3)
    t = F.col("l")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(t) - 3),
            lambda i: F.concat_ws(
                " ", F.element_at(t, i + 1), F.element_at(t, i + 2), F.element_at(t, i + 3)
            ),
        )
    )
    sh = toks.select("doc_id", F.explode(shingles).alias("sg"))
    ev = sh.filter(F.col("doc_id") % 97 == 0).select(F.col("doc_id").alias("eval_id"), "sg")
    tr = sh.filter(F.col("doc_id") % 97 != 0)
    return (
        tr.join(ev, "sg")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("sg").alias("n_overlap"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
        .filter(F.col("n_overlap") >= 2)
    )


@register(
    "pack_sequences",
    survey_ref="M5:text,§2.8",
    oracle="""
WITH sized AS (
  SELECT doc_id, lang,
         LEN(string_split(text, ' ')) AS n_tokens
  FROM documents
),
packed AS (
  SELECT doc_id, lang, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tokens AS start_offset
  FROM sized
)
SELECT doc_id, lang,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(start_offset AS BIGINT) AS start_offset,
       CAST(start_offset // 512 AS BIGINT) AS pack_id,
       CAST(start_offset % 512 AS BIGINT) AS pack_offset
FROM packed
""",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing — the layout step that turns a
    document corpus into fixed-length (512-token) training examples:
    docs are concatenated in deterministic order and every doc gets the
    pack id and offset where it starts. Packing runs PER SHARD (here
    ``lang``; at 100 TB a hash-range shard column) so the running-total
    window partitions by shard instead of single-partitioning the
    corpus — each shard packs independently, which is exactly how
    training pipelines shard their tokenized data anyway. One shuffle
    on the shard key; token counting is a row-local expression."""
    d = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tokens = F.size(F.split(F.col("text"), " "))
    sized = d.select("doc_id", "lang", n_tokens.alias("n_tokens"))
    packed = sized.withColumn(
        "start_offset", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return packed.select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("start_offset").cast("long").alias("start_offset"),
        F.floor(F.col("start_offset") / 512).cast("long").alias("pack_id"),
        (F.col("start_offset") % 512).cast("long").alias("pack_offset"),
    )


_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IP = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
_PII_PHONE = r"555-\d{4}"


@register(
    "pii_redact",
    survey_ref="M5:text",
    oracle=f"""
WITH pii AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com from 10.0.' ||
         CAST(doc_id % 256 AS VARCHAR) || '.1 call 555-' || CAST(1000 + doc_id % 9000 AS VARCHAR) AS t
  FROM documents
),
red AS (
  SELECT doc_id,
         CAST(LEN(regexp_extract_all(t, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
         CAST(LEN(regexp_extract_all(t, '{_PII_IP}')) AS BIGINT) AS n_ips,
         CAST(LEN(regexp_extract_all(t, '{_PII_PHONE}')) AS BIGINT) AS n_phones,
         regexp_replace(regexp_replace(regexp_replace(t,
            '{_PII_EMAIL}', '<EMAIL>', 'g'),
            '{_PII_IP}', '<IP>', 'g'),
            '{_PII_PHONE}', '<PHONE>', 'g') AS redacted
  FROM pii
)
SELECT doc_id, n_emails, n_ips, n_phones,
       CAST(LEN(redacted) AS BIGINT) AS redacted_len,
       md5(redacted) AS redacted_md5
FROM red
""",
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction sweep (emails / IPv4s / phone
    numbers), the compliance pass a training corpus runs before
    anything else ships. The fixture corpus carries no PII, so a
    deterministic synthetic suffix is appended IDENTICALLY in both
    engines and then redacted; per-doc match counts and the md5 of the
    redacted text are compared hash-exactly. Row-local regex chains,
    whole-stage codegen, zero shuffles — at 100 TB this is a pure
    map-only scan. Patterns stay in the Java-regex ∩ RE2 dialect
    subset so both engines match identically."""
    d = load_table(spark, sf_dir, "documents")
    t = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".1 call 555-"),
        (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
    )
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, _PII_EMAIL, "<EMAIL>"), _PII_IP, "<IP>"
        ),
        _PII_PHONE,
        "<PHONE>",
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(_PII_EMAIL), F.lit(0))).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(_PII_IP), F.lit(0))).cast("long").alias("n_ips"),
        F.size(F.regexp_extract_all(t, F.lit(_PII_PHONE), F.lit(0))).cast("long").alias("n_phones"),
        F.length(red).cast("long").alias("redacted_len"),
        F.md5(red).alias("redacted_md5"),
    )


@register(
    "corpus_filter_pipeline",
    survey_ref="M5:text,M5:dedup,§3.1",
    oracle="""
WITH metrics AS (
  SELECT doc_id, text, lang,
         LEN(string_split(text, ' ')) AS n_tokens,
         LEN(list_distinct(string_split(text, ' '))) * 1.0
           / LEN(string_split(text, ' ')) AS ttr
  FROM documents
),
keep_first AS (
  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY text) AS canonical
  FROM documents
)
SELECT m.doc_id, m.lang,
       CAST(m.n_tokens AS BIGINT) AS n_tokens,
       ROUND(m.ttr, 6) AS ttr
FROM metrics m JOIN keep_first k ON m.doc_id = k.doc_id
WHERE m.n_tokens >= 5 AND m.ttr >= 0.3 AND m.doc_id = k.canonical
""",
)
def q_corpus_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus curation in one DAG: quality gates
    (length + lexical diversity) and exact-dup keep-first (min doc_id
    per identical text, a window — at 100 TB a groupBy on a text hash
    joined back, same semantics). What survives is the clean corpus;
    the lineage stays declarative so Catalyst fuses the gates into the
    scan."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    m = d.select(
        "doc_id",
        "lang",
        "text",
        F.size(toks).alias("n_tokens"),
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("ttr"),
    )
    w = Window.partitionBy("text")
    m = m.withColumn("canonical", F.min("doc_id").over(w))
    return (
        m.filter((F.col("n_tokens") >= 5) & (F.col("ttr") >= 0.3) & (F.col("doc_id") == F.col("canonical")))
        .select("doc_id", "lang", F.col("n_tokens").cast("long").alias("n_tokens"), F.round("ttr", 6).alias("ttr"))
    )


_CHUNK_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS tk,
         LEN(string_split(text, ' ')) AS n
  FROM documents
),
k AS (
  SELECT doc_id, tk, n, UNNEST(range(0, CAST(CEIL(n / 24.0) AS BIGINT))) AS c
  FROM t
)
SELECT doc_id, CAST(c AS INTEGER) AS chunk_no,
       CAST(LEAST(n - c * 24, 32) AS INTEGER) AS n_tokens,
       array_to_string(tk[c * 24 + 1 : LEAST(c * 24 + 32, n)], ' ') AS chunk_text
FROM k
"""


@register(
    "chunk_documents_hof",
    survey_ref="M5:text,§2.5",
    oracle=_CHUNK_ORACLE,
)
def q_chunk_documents_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production twin the UDTF chunker's docstring promises: the
    SAME sliding-window chunking (window 32, stride 24, shorter tails)
    as pure higher-order array expressions — sequence → explode →
    slice → array_join, entirely whole-stage codegen, zero Python.
    Shares the UDTF query's oracle verbatim, so the driver gate proves
    the slow-path API demo and the 100 TB fast path emit identical
    chunks."""
    d = load_table(spark, sf_dir, "documents")
    tk = F.split(F.col("text"), " ")
    n = F.size(tk)
    chunks = d.select(
        "doc_id",
        tk.alias("tk"),
        F.explode(F.sequence(F.lit(0), F.ceil(n / F.lit(24.0)).cast("int") - 1)).alias("c"),
    )
    piece = F.slice(F.col("tk"), F.col("c") * 24 + 1, 32)
    return chunks.select(
        "doc_id",
        F.col("c").cast("int").alias("chunk_no"),
        F.size(piece).cast("int").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


@register(
    "udtf_chunk_documents",
    survey_ref="§2.12,M5:text",
    oracle=_CHUNK_ORACLE,
)
def q_udtf_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking via a Python UDTF called through LATERAL —
    the sliding-window chunker of a training-data/RAG pipeline (window
    32 tokens, stride 24, tail chunks shorter), and the corpus's
    genuine table-function surface (one input row → N output rows with
    per-row Python logic; contrast the pure-SQL exploders elsewhere).
    Row-at-a-time Python is the slow path — the UDTF is the API
    demonstration; the same chunking at 100 TB belongs in a
    whole-stage-codegen slice expression or a mapInPandas kernel."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_no int, n_tokens int, chunk_text string")
    class ChunkText:
        def eval(self, text: str):
            if not text:
                return
            toks = text.split(" ")
            window, stride = 32, 24
            for k in range((len(toks) + stride - 1) // stride):
                start = k * stride
                if start >= len(toks):
                    break
                chunk = toks[start : start + window]
                yield k, len(chunk), " ".join(chunk)

    spark.udtf.register("chunk_text_udtf", ChunkText)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents_for_chunking")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_no, c.n_tokens, c.chunk_text
        FROM documents_for_chunking d, LATERAL chunk_text_udtf(d.text) c
        """
    )


@register(
    "bigram_association_lift",
    survey_ref="M5:text,§2.6",
    oracle="""
WITH tok AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) s,
       UNNEST(range(1, LEN(t))) AS r(i)
),
uni AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT UNNEST(string_split(text, ' ')) AS w FROM documents
  ) u GROUP BY w
),
big AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_ab FROM tok GROUP BY w1, w2
),
n_tot AS (SELECT SUM(c) AS n FROM uni)
SELECT b.w1, b.w2, b.c_ab,
       ROUND(b.c_ab * n_tot.n * 1.0 / (ua.c * ub.c), 6) AS lift
FROM big b
JOIN uni ua ON ua.w = b.w1
JOIN uni ub ON ub.w = b.w2
CROSS JOIN n_tot
WHERE b.c_ab >= 8
""",
)
def q_bigram_association_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: association lift of adjacent-token bigrams,
    lift(a,b) = P(ab) / (P(a)·P(b)) computed as the exact integer ratio
    c_ab·N / (c_a·c_b) — PMI without the log, so the score is a single
    IEEE division identical across engines. Bigram and unigram counts
    partial-aggregate map-side; the unigram table is vocabulary-sized,
    so both probability joins broadcast — at 100 TB the only
    corpus-scale shuffle is the bigram count itself."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    pairs = toks.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("t"), 1, F.greatest(F.size("t") - 1, F.lit(0))),
                F.slice(F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    uni = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_ab"))
    n_tot = uni.agg(F.sum("c").alias("n"))
    ua = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b"))
    return (
        big.filter(F.col("c_ab") >= 8)
        .join(F.broadcast(ua), "w1")
        .join(F.broadcast(ub), "w2")
        .join(F.broadcast(n_tot))
        .select(
            "w1",
            "w2",
            "c_ab",
            F.round(F.col("c_ab") * F.col("n") * 1.0 / (F.col("c_a") * F.col("c_b")), 6).alias(
                "lift"
            ),
        )
    )


# ---------------------------------------------------------------------------
# BPE merge training — the iterative tokenizer-training loop.

_BPE_ROUNDS = 5


def _bpe_merge_fold(syms, a: str, b: str):
    """Apply one BPE merge rule (a, b) → a+b to a symbol array,
    left-to-right, non-overlapping — as a single JVM-side array fold.

    The accumulator is seeded with a sentinel '' (symbols are never
    empty) so ``element_at(acc, -1)`` is always defined under ANSI
    mode; the sentinel is stripped by the final single-pass filter, so
    the fold expression is referenced exactly once (no expression
    recompute).

    Column form, kept as the readable reference;
    ``_bpe_merge_fold_sql`` is the SQL-string twin the hot loops use
    (r11 build-cost audit: the Column form costs ~0.1 s of Py4J
    round-trips per rule — ∝ R on the driver — while the string
    parses JVM-side; plan equality asserted in
    tests/test_sqlstring_forms.py)."""
    merged = a + b
    folded = F.aggregate(
        syms,
        F.array(F.lit("")),
        lambda acc, x: F.when(
            (F.element_at(acc, -1) == F.lit(a)) & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return F.filter(folded, lambda y: y != "")


def _sql_str(s: str) -> str:
    """Spark-SQL single-quoted string literal (C-style escaping) — BPE
    symbols come from corpus text, so quotes/backslashes must survive
    the SQL-string expression path."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _bpe_merge_fold_sql(col: str, a: str, b: str) -> str:
    """SQL-string twin of ``_bpe_merge_fold`` (same sentinel fold,
    parsed JVM-side in one selectExpr instead of ~20 Py4J calls)."""
    qa, qb, qm = _sql_str(a), _sql_str(b), _sql_str(a + b)
    # CASE WHEN (not IF): F.when builds CaseWhen, and sameResult does
    # not canonicalize If↔CaseWhen — CASE keeps the two forms
    # plan-identical, which the test asserts
    return (
        f"filter(aggregate({col}, array(''), (acc, x) -> "
        f"CASE WHEN element_at(acc, -1) = {qa} AND x = {qb} "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array({qm})) "
        f"ELSE concat(acc, array(x)) END), y -> y != '')"
    )


def _pairs_sql(col: str) -> str:
    """Adjacent-pair structs of a symbol array, as a SQL string."""
    return (
        f"zip_with(slice({col}, 1, size({col}) - 1), slice({col}, 2, size({col}) - 1),"
        f" (p, q) -> named_struct('a', p, 'b', q))"
    )


def _signed_pairs_sql(col: str, neg: bool) -> str:
    """±w-weighted adjacent pairs (the trainer's delta recount)."""
    w = "-w" if neg else "w"
    return (
        f"transform({_pairs_sql(col)},"
        f" p -> named_struct('a', p.a, 'b', p.b, 'freq', {w}))"
    )


def _bpe_oracle_parts(rounds: int) -> list[str]:
    """Unrolled materialized CTEs w0..w{rounds} of the BPE training
    loop: each round recomputes pair counts, picks the same
    lexicographically tie-broken top pair, and re-folds every word
    with ``list_reduce`` (same sentinel trick as the Spark side).
    Shared by the training oracle and the encode-apply oracle."""
    parts = [
        """w0 AS MATERIALIZED (
  SELECT string_split(tok, '') AS s
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
  WHERE LENGTH(tok) >= 2
)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""p{r} AS (
  SELECT (pr).a AS a, (pr).b AS b, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (
    SELECT unnest(list_transform(range(1, len(s)),
                  i -> {{'a': s[i], 'b': s[i+1]}})) AS pr
    FROM w{r - 1}
  )
  GROUP BY 1, 2
),
t{r} AS MATERIALIZED (
  SELECT a, b, a || b AS m, freq FROM p{r}
  ORDER BY freq DESC, a, b LIMIT 1
),
w{r} AS MATERIALIZED (
  SELECT list_filter(
           list_reduce([['']] || list_transform(s, x -> [x]),
             (acc, x) -> CASE WHEN acc[-1] = t.a AND x[1] = t.b
                         THEN acc[1:len(acc)-1] || [t.m]
                         ELSE acc || x END),
           y -> y <> '') AS s
  FROM w{r - 1}, t{r} t
)"""
        )
    return parts


def _bpe_oracle_sql(rounds: int) -> str:
    union = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, a AS sym_a, b AS sym_b, m AS merged, freq FROM t{r}"
        for r in range(1, rounds + 1)
    )
    return "WITH " + ",\n".join(_bpe_oracle_parts(rounds)) + "\n" + union


def _bpe_words(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Weighted distinct-word table (symbol array, weight) — the ONE
    token-scale pass of the BPE family; eagerly checkpointed so both
    the trainer and the encoder read the materialized vocab."""
    # fixture documents arrive as one parquet file = one scan task, so
    # spread the token-scale explode across cores first — but ONLY
    # when the scan has fewer splits than cores: an unconditional
    # repartition would exchange the raw corpus (the most expensive
    # shuffle a 100 TB pipeline could buy — there splits >> cores and
    # this branch never fires), while at fixture/medium scale the
    # raw-byte exchange is cheap relative to the ~3x explode speedup
    # it buys (measured at the 1000x probe: 25.4 s starved on 10
    # splits vs 9.4 s spread).
    docs = spread_scan(docs)
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .filter(F.length("tok") >= 2)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("w"))
        # Spark's split('', -1) keeps a trailing empty string where
        # DuckDB's string_split does not — filter to the real chars.
        .select(
            F.filter(F.split(F.col("tok"), ""), lambda c: c != "").alias("s"),
            "w",
        )
        .localCheckpoint(eager=True)
    )


def bpe_train(
    spark: SparkSession,
    docs: DataFrame,
    rounds: int,
    on_round=None,
    words: DataFrame | None = None,
) -> list[tuple[int, str, str, str, int]]:
    """Distributed BPE merge-training loop over a documents frame.

    Representation: the WEIGHTED DISTINCT-WORD table (Sennrich et al.
    2016 reference trainer) — tokens are grouped once (`groupBy(tok)`,
    the ONLY token-scale pass, map-side combinable to vocab-size rows
    per partition) and every subsequent round operates on (symbol
    array, weight) rows at VOCABULARY scale. At 100 TB of text the
    token stream is ~10^4-10^6x the distinct-word vocabulary, so this
    is the difference between an O(corpus) and an O(vocab) round.

    Incremental pair counts: the corpus-wide weighted pair count runs
    once; after adopting merge (a,b)->m only words CONTAINING the
    bigram change, so each round applies the signed weighted pair
    delta (folded minus unfolded, affected rows only) to the counts
    table via a union + re-aggregate — ONE exchange, no join. The
    argmax reads the counts table (pair vocabulary, never the token
    stream); the adopted rule is a driver-held 3-string value (same
    license as the kmeans centroids).

    Round shape (the r9 perf fix — the old loop paid ~5 eager
    corpus-scale localCheckpoints and a measured 13.4 s cold at
    sf0.1): ONE tagged vocab pass per round computes hit-flag, folded
    symbols, and the pre-fold copy of affected rows side by side and
    eagerly localCheckpoints it, so every plan Catalyst compiles is
    flat (scan-of-RDD + project) — the per-round driver-side compile
    cost, which profiling showed dominated the old loop, stays
    constant across thousands of merges. The counts update is a LAZY
    localCheckpoint materialized inside the next round's argmax job,
    so a steady-state round is two short actions. The vocab rewrite is
    O(vocab) with a tiny constant (pure column ops, no explode); the
    delta explode is O(affected occurrences) exactly. Duplicate symbol
    arrays that a fold may create are left un-grouped deliberately —
    pair counts SUM weights and filters/folds act row-wise, so
    spending an exchange to re-group them buys nothing.

    The learned merge table is identical to the token-multiset
    trainer's: frequencies are exact weighted integer sums and the
    (freq DESC, a, b) tie-break is total, so the result is bit-stable
    at any partitioning. ``scripts/bpe_curve.py`` records the
    per-round marginal cost at rounds=50 (BPE_CURVE.md)."""
    from high_energy_gamma_ray_search_in_kascade_array_data_spark.queries.analytics_ext import _loop_shuffle

    if words is None:
        words = _bpe_words(spark, docs)

    def pair_structs(s):
        return F.zip_with(
            F.slice(s, 1, F.size(s) - 1),
            F.slice(s, 2, F.size(s) - 1),
            lambda p, q: F.struct(p.alias("a"), q.alias("b")),
        )

    rules: list[tuple[int, str, str, str, int]] = []
    cur = words
    with _loop_shuffle(spark, 8):
        # the ONLY corpus-wide pair count — rounds 2..R maintain it by delta
        counts = (
            words.select(F.explode(pair_structs(F.col("s"))).alias("pr"), "w")
            .groupBy(F.col("pr.a").alias("a"), F.col("pr.b").alias("b"))
            .agg(F.sum("w").alias("freq"))
            .localCheckpoint(eager=False)
        )
        # Each round is FOUR driver statements (argmax, tagged fold,
        # counts update — and the next argmax), every one a single
        # spark.sql with DataFrame kwargs: the Column/chained-select
        # form cost ~0.25 s of Py4J build PER ROUND (∝ R on the
        # driver, serialized under concurrency — r11 audit); one
        # JVM-parsed statement per step keeps marginal driver cost
        # ~flat and tiny. Results are oracle-exact; the fold string is
        # plan-equal to the Column reference by
        # tests/test_sqlstring_forms.py. The delta recount is folded
        # into the counts-update statement (the tagged frame it reads
        # is eagerly checkpointed, so the subquery scans memory).
        argmax_sql = "SELECT a, b, freq FROM {c} ORDER BY freq DESC, a, b LIMIT 1"
        for r in range(1, rounds + 1):
            top = spark.sql(argmax_sql, c=counts).collect()[0]
            a, b, freq = top["a"], top["b"], int(top["freq"])
            rules.append((r, a, b, a + b, freq))
            if r < rounds:
                # one tagged vocab pass: fold affected rows, keep the
                # pre-fold copy beside them for the delta recount; the
                # hit flag is STAGED in a subquery so the fold/copy
                # projections reference it without recompute
                has_sql = (
                    f"exists({_pairs_sql('s')},"
                    f" p -> p.a = {_sql_str(a)} AND p.b = {_sql_str(b)})"
                )
                tagged = spark.sql(
                    f"""
SELECT IF(hit, {_bpe_merge_fold_sql('s', a, b)}, s) AS s,
       IF(hit, s, NULL) AS s_pre,
       w
FROM (SELECT s, w, {has_sql} AS hit FROM {{cur}}) t""",
                    cur=cur,
                ).localCheckpoint(eager=True)
                counts = spark.sql(
                    f"""
SELECT a, b, freq FROM (
  SELECT a, b, SUM(freq) AS freq FROM (
    SELECT a, b, freq FROM {{c}}
    UNION ALL
    SELECT pr.a AS a, pr.b AS b, pr.freq AS freq FROM (
      SELECT explode(concat({_signed_pairs_sql('s_pre', True)},
                            {_signed_pairs_sql('s', False)})) AS pr
      FROM {{t}} WHERE s_pre IS NOT NULL
    ) d
  ) u GROUP BY a, b
) g WHERE freq > 0""",
                    c=counts,
                    t=tagged,
                ).localCheckpoint(eager=False)
                cur = tagged.select("s", "w")
            if on_round is not None:
                # marginal-cost instrumentation hook (scripts/bpe_curve.py)
                on_round(r)
    return rules


@register(
    "bpe_merge_training",
    survey_ref="M5:text,§2.6",
    oracle=_bpe_oracle_sql(_BPE_ROUNDS),
)
def q_bpe_merge_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING — the iterative merge-learning loop
    itself, not just pretokenization (which ``bpe_pretokenize_counts``
    covers): 5 rounds of (count adjacent symbol pairs corpus-wide →
    adopt the most frequent pair as a merge rule, ties broken
    lexicographically → re-segment every word), returning the learned
    merge table (round, pair, merged symbol, frequency at adoption).

    The loop lives in ``bpe_train`` (weighted distinct-word
    representation, incremental pair counts, lazy per-round
    checkpoints — see its docstring for the scale argument); the
    DuckDB twin recomputes each round from scratch over the raw token
    multiset, proving the weighted incremental trainer learns the
    identical merge table. ``scripts/bpe_curve.py`` runs the same
    loop at rounds=50 and records the per-round marginal cost curve
    (BPE_CURVE.md) — real training is thousands of merges, so flat
    marginal cost is the design claim."""
    rules = bpe_train(spark, load_table(spark, sf_dir, "documents"), _BPE_ROUNDS)
    return spark.createDataFrame(
        rules, "round int, sym_a string, sym_b string, merged string, freq bigint"
    )


_BPE_ENCODE_ORACLE = (
    "WITH "
    + ",\n".join(_bpe_oracle_parts(_BPE_ROUNDS))
    + f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(len(s)) AS BIGINT) AS n_symbols,
       CAST(SUM(list_sum(list_transform(s, x -> LENGTH(x)))) AS BIGINT) AS n_chars,
       CAST((SELECT COUNT(DISTINCT x)
             FROM (SELECT unnest(s) AS x FROM w{_BPE_ROUNDS})) AS BIGINT)
         AS distinct_symbols,
       ROUND(SUM(list_sum(list_transform(s, x -> LENGTH(x)))) * 1.0 / SUM(len(s)), 6)
         AS compression
FROM w{_BPE_ROUNDS}
"""
)


@register(
    "bpe_encode_apply",
    survey_ref="M5:text,§2.6",
    oracle=_BPE_ENCODE_ORACLE,
)
def q_bpe_encode_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLICATION — the pipeline step AFTER training
    (new r10): learn the merge table with ``bpe_train``, then ENCODE
    the corpus by applying every adopted merge in rank order, and
    report the numbers a data pipeline sizes itself by: word/symbol/
    char totals, post-encode symbol vocabulary, and the chars-per-
    symbol compression ratio (the quantity tokenizer training
    optimizes).

    Scale shape: the encode reuses the weighted distinct-word
    representation (one token-scale groupBy; every fold pass is
    vocabulary-scale), and the R merges apply as R chained JVM array
    folds in a single projection — each fold references its input
    exactly once, so Catalyst's CollapseProject keeps it one linear
    pass with no expression recompute. The final accounting is one
    map-side-combinable aggregate plus one distinct over the exploded
    symbol vocabulary (output-bounded). The learned rules ride the
    driver as R 3-string values (kmeans-centroid license). The DuckDB
    twin re-learns the table from scratch (unrolled CTEs) and encodes
    the raw token multiset — proving weighted-vocab encode ==
    multiset encode."""
    docs = load_table(spark, sf_dir, "documents")
    words = _bpe_words(spark, docs)
    rules = bpe_train(spark, docs, _BPE_ROUNDS, words=words)
    return bpe_encode_stats(words, rules)


@register(
    "bpe_encode_apply_vec",
    survey_ref="M5:text,§2.6,§2.12",
    oracle=_BPE_ENCODE_ORACLE,
)
def q_bpe_encode_apply_vec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LARGE-merge-table encode path (new r11): same training and
    the same corpus accounting as ``bpe_encode_apply``, but the merges
    apply through ``bpe_encode_stats_vec`` — one Arrow-vectorized
    mapInPandas kernel carrying the whole rule table as a task
    constant, with per-(word, rule) distinct-symbol pruning. Plan cost
    is O(1) in the rule count R where the fold form grows ∝ R (≈8 ms/
    rule at sf0.1), so this is the 30k-rule production path; measured
    flat 0.42–0.49 s across R∈{5..50} with crossover ≈R=25
    (BPE_ENCODE_CURVE.md). Shares the fold form's DuckDB re-fold twin
    oracle — identical semantics (each rule once, rank order, one
    left-to-right non-overlapping pass per rule), verified exactly at
    every measured R and against DuckDB at R=50."""
    docs = load_table(spark, sf_dir, "documents")
    words = _bpe_words(spark, docs)
    rules = bpe_train(spark, docs, _BPE_ROUNDS, words=words)
    return bpe_encode_stats_vec(words, rules)


def _bpe_stats_frame(enc: DataFrame) -> DataFrame:
    """Corpus accounting over an encoded weighted-word frame (s, w):
    one map-side-combinable aggregate + one output-bounded distinct."""
    n_chars = F.aggregate(
        F.col("s"), F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    stats = enc.agg(
        F.sum("w").cast("long").alias("n_words"),
        F.sum(F.size("s") * F.col("w")).cast("long").alias("n_symbols"),
        F.sum(n_chars * F.col("w")).cast("long").alias("n_chars"),
    )
    dsym = enc.select(F.explode("s").alias("x")).agg(
        F.countDistinct("x").cast("long").alias("distinct_symbols")
    )
    return stats.crossJoin(F.broadcast(dsym)).select(
        "n_words",
        "n_symbols",
        "n_chars",
        "distinct_symbols",
        F.round(F.col("n_chars") * 1.0 / F.col("n_symbols"), 6).alias("compression"),
    )


def bpe_encode_stats(words: DataFrame, rules: list[tuple]) -> DataFrame:
    """Fold-form encode: the R merges apply as R chained JVM array
    folds in a single projection (CollapseProject keeps it one linear
    pass, each fold referenced exactly once). The reference encoder —
    oracle-checked at the corpus R=5 — but its expression tree grows
    ∝ R, so analysis/codegen cost makes it the SMALL-R form; see
    ``bpe_encode_stats_vec`` and BPE_ENCODE_CURVE.md for the law."""
    # compose ONE nested fold string instead of chaining R selectExprs:
    # each chained select eagerly ANALYZES a plan already containing
    # k nested folds (O(R²) JVM analysis — measured 1.4 s at R=5 in
    # the r11 build audit); the composed string is analyzed once,
    # O(R). Optimized plan is the same either way (CollapseProject
    # merges the chain), asserted in tests/test_sqlstring_forms.py.
    expr = "s"
    for _, a, b, _m, _f in rules:
        expr = _bpe_merge_fold_sql(expr, a, b)
    enc = words.selectExpr(f"{expr} AS s", "w")
    enc = enc.localCheckpoint(eager=True)  # two consumers in the stats
    return _bpe_stats_frame(enc)


def bpe_encode_stats_vec(words: DataFrame, rules: list[tuple]) -> DataFrame:
    """Arrow-vectorized encode for LARGE merge tables (the 30k-rule
    regime real tokenizers run): one mapInPandas kernel carries the
    whole rule table as a task constant and applies, per word, the
    IDENTICAL semantics as the fold form — each rule once, in rank
    order, one left-to-right non-overlapping pass — with a
    distinct-symbol pre-filter per (word, rule) so a rule whose parts
    are absent costs O(1), not a pass (the standard encoder pruning;
    at R ≫ |word| almost every rule is skipped). Plan cost is O(1) in
    R: no expression-tree growth, no recompile per rule.
    Exactness vs the fold form is asserted at every measured R by
    ``scripts/bpe_encode_curve.py``; the fold form itself is pinned to
    the DuckDB re-fold twin by the registry oracle."""
    pairs = [(a, b) for _, a, b, _m, _f in rules]

    def encode_batches(batches):
        import pandas as pd

        for pdf in batches:
            out_s = []
            for syms in pdf["s"]:
                s = list(syms)
                present = set(s)
                for a, b in pairs:
                    if a not in present or b not in present:
                        continue
                    res = []
                    i, n = 0, len(s)
                    merged_any = False
                    while i < n:
                        if i + 1 < n and s[i] == a and s[i + 1] == b:
                            res.append(a + b)
                            i += 2
                            merged_any = True
                        else:
                            res.append(s[i])
                            i += 1
                    if merged_any:
                        s = res
                        present = set(s)
                out_s.append(s)
            yield pd.DataFrame({"s": out_s, "w": pdf["w"]})

    enc = words.select("s", "w").mapInPandas(encode_batches, "s array<string>, w long")
    enc = enc.localCheckpoint(eager=True)  # two consumers in the stats
    return _bpe_stats_frame(enc)


# ------------------------------------------ round-6: pipeline observability

@register(
    "filter_funnel_report",
    survey_ref="P5,A3,§2.6",
    oracle="""
WITH d AS (
  SELECT LEN(string_split(text, ' ')) AS ntok,
         LENGTH(REPLACE(text, ' ', '')) AS nchr,
         LEN(list_distinct(string_split(text, ' '))) AS ndis
  FROM documents
), flags AS (
  SELECT CASE WHEN ntok >= 5 THEN 1 ELSE 0 END AS f1,
         CASE WHEN ntok >= 5 AND nchr <= 12 * ntok THEN 1 ELSE 0 END AS f2,
         CASE WHEN ntok >= 5 AND nchr <= 12 * ntok AND 10 * ndis >= 3 * ntok
              THEN 1 ELSE 0 END AS f3
  FROM d
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS s0, CAST(SUM(f1) AS BIGINT) AS s1,
         CAST(SUM(f2) AS BIGINT) AS s2, CAST(SUM(f3) AS BIGINT) AS s3
  FROM flags
)
SELECT stage, n_surviving, n_removed_this_stage FROM (
  SELECT 0 AS stage, s0 AS n_surviving, CAST(0 AS BIGINT) AS n_removed_this_stage FROM agg
  UNION ALL SELECT 1, s1, s0 - s1 FROM agg
  UNION ALL SELECT 2, s2, s1 - s2 FROM agg
  UNION ALL SELECT 3, s3, s2 - s3 FROM agg
) ORDER BY stage
""",
)
def q_filter_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALITY-FILTER FUNNEL — the observability report every corpus
    build publishes: how many documents each filter removes, applied
    in pipeline order (min length → mean-token-length gibberish gate →
    repetition/diversity gate).  All three predicates are exact
    integer cross-multiplications (no float ratios), and the whole
    funnel is ONE pass: per-doc flags then a single aggregate — at
    100 TB you never re-scan the corpus once per filter."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    ntok = F.size(toks)
    nchr = F.length(F.regexp_replace("text", " ", ""))
    ndis = F.size(F.array_distinct(toks))
    f1 = (ntok >= 5).cast("long")
    f2 = ((ntok >= 5) & (nchr <= 12 * ntok)).cast("long")
    f3 = ((ntok >= 5) & (nchr <= 12 * ntok) & (10 * ndis >= 3 * ntok)).cast("long")
    agg = docs.select(f1.alias("f1"), f2.alias("f2"), f3.alias("f3")).agg(
        F.count("*").alias("s0"),
        F.sum("f1").alias("s1"),
        F.sum("f2").alias("s2"),
        F.sum("f3").alias("s3"),
    )
    rows = []
    for stage, cur, prev in ((0, "s0", None), (1, "s1", "s0"), (2, "s2", "s1"), (3, "s3", "s2")):
        rows.append(
            agg.select(
                F.lit(stage).alias("stage"),
                F.col(cur).alias("n_surviving"),
                (F.col(prev) - F.col(cur) if prev else F.lit(0).cast("long")).alias(
                    "n_removed_this_stage"
                ),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("stage")


_MIX_BUDGET = 10000


@register(
    "mixture_temperature_allocation",
    survey_ref="A9,§2.6",
    oracle=f"""
WITH c AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY source
), w AS (
  SELECT source, n,
         CAST(CASE WHEN (CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT) + 1)
                        * (CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT) + 1) <= n
                   THEN CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT) + 1
                   WHEN CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT)
                        * CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT) > n
                   THEN CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT) - 1
                   ELSE CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT) END AS BIGINT) AS wgt
  FROM c
), t AS (SELECT CAST(SUM(wgt) AS BIGINT) AS total FROM w)
SELECT w.source, w.n, w.wgt,
       CAST({_MIX_BUDGET} * w.wgt // t.total AS BIGINT) AS allocation
FROM w, t ORDER BY w.source
""",
)
def q_mixture_temperature_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE-WEIGHTED mixture allocation (α = 1/2): per-source
    sampling budgets ∝ √count — the standard up-weighting of small
    sources when mixing corpora for training (α=1 is proportional,
    α=0 uniform; √ is the common middle).  √count is the EXACT integer
    square root (±1-corrected FLOOR(SQRT), same device as the Adam
    optimizer's oracle), so the allocation is integer floor arithmetic
    end to end — deterministic across engines and re-runs.  One
    partial aggregate over sources; the tiny weight relation never
    re-touches the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(F.count("*").alias("n"))
    fs = F.floor(F.sqrt(F.col("n").cast("double"))).cast("long")
    wgt = (
        F.when((fs + 1) * (fs + 1) <= F.col("n"), fs + 1)
        .when(fs * fs > F.col("n"), fs - 1)
        .otherwise(fs)
    )
    w = c.select("source", "n", wgt.alias("wgt"))
    t = w.agg(F.sum("wgt").alias("total"))
    return (
        w.crossJoin(F.broadcast(t))
        .select(
            "source",
            "n",
            "wgt",
            F.floor(F.lit(_MIX_BUDGET) * F.col("wgt") / F.col("total"))
            .cast("long")
            .alias("allocation"),
        )
        .orderBy("source")
    )


@register(
    "blocked_fuzzy_match",
    survey_ref="M5:dedup,§2.7",
    oracle="""
WITH b AS (
  SELECT doc_id, lang, SUBSTRING(text, 1, 8) AS blk, SUBSTRING(text, 1, 40) AS probe
  FROM documents
)
SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
       CAST(levenshtein(a.probe, c.probe) AS BIGINT) AS lev
FROM b a JOIN b c
  ON a.lang = c.lang AND a.blk = c.blk AND a.doc_id < c.doc_id
WHERE levenshtein(a.probe, c.probe) <= 10
ORDER BY doc_a, doc_b
""",
)
def q_blocked_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOCKED FUZZY MATCHING — the entity-resolution workhorse next
    to MinHash: candidate pairs form only inside a cheap blocking key
    (language × 8-char prefix), then an edit-distance verify on a
    bounded probe window keeps near-identical pairs.  Levenshtein is
    exact integer dynamic programming in BOTH engines' built-ins
    (JVM-side codegen in Spark — no Python), so the fuzzy join is
    exact-hash gated.  The self-join is keyed on the block — the
    cross product never materializes, the same scale guarantee as the
    LSH band join; at 100 TB you size the blocking key so the largest
    block stays executor-bounded (add a second key column the day it
    does not)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.substring("text", 1, 8).alias("blk"),
        F.substring("text", 1, 40).alias("probe"),
    )
    a = d.select(
        F.col("doc_id").alias("doc_a"), "lang", "blk", F.col("probe").alias("pa")
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lang_b"),
        F.col("blk").alias("blk_b"),
        F.col("probe").alias("pb"),
    )
    lev = F.levenshtein(F.col("pa"), F.col("pb"))
    return (
        a.join(
            b,
            (F.col("lang") == F.col("lang_b"))
            & (F.col("blk") == F.col("blk_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .filter(lev <= 10)
        .select("doc_a", "doc_b", lev.cast("long").alias("lev"))
        .orderBy("doc_a", "doc_b")
    )


@register(
    "heaps_law_vocab_growth",
    survey_ref="M5:text,§2.6,§2.8",
    oracle="""
WITH mx AS (SELECT MAX(doc_id) + 1 AS n FROM documents),
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
bucketed AS (
  SELECT CAST((doc_id * 10) // mx.n AS INTEGER) AS bucket, tok
  FROM toks, mx
),
per_bucket_tokens AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_tok FROM bucketed GROUP BY bucket
),
first_bucket AS (
  SELECT tok, MIN(bucket) AS fb FROM bucketed GROUP BY tok
),
new_vocab AS (
  SELECT fb AS bucket, CAST(COUNT(*) AS BIGINT) AS n_new FROM first_bucket GROUP BY fb
)
SELECT t.bucket,
       CAST(SUM(t.n_tok) OVER (ORDER BY t.bucket) AS BIGINT) AS tokens_cum,
       CAST(SUM(COALESCE(v.n_new, 0)) OVER (ORDER BY t.bucket) AS BIGINT) AS vocab_cum
FROM per_bucket_tokens t LEFT JOIN new_vocab v USING (bucket)
ORDER BY t.bucket
""",
)
def q_heaps_law_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve: cumulative distinct-token
    count vs cumulative token count across the corpus in doc_id order,
    sampled at 10 corpus-fraction buckets — the saturation diagnostic
    a training-data pipeline uses to decide whether more raw data
    still adds vocabulary (dedup'd corpora flatten early).

    Scale shape: a token-scale (tok → min bucket) aggregate and a
    10-key token-count aggregate are the only event-scale exchanges;
    the cumulative windows run over exactly 10 rows. The first-
    occurrence decomposition avoids any cumulative COUNT(DISTINCT)
    over the raw stream (which would need a per-prefix distinct — the
    banned fact-scale-sort shape)."""
    d = load_table(spark, sf_dir, "documents")
    mx = d.agg((F.max("doc_id") + 1).alias("n"))
    bucketed = (
        d.crossJoin(F.broadcast(mx))
        .select(
            F.expr("(doc_id * 10) DIV n").cast("int").alias("bucket"),
            F.explode(F.split(F.col("text"), " ")).alias("tok"),
        )
    )
    per_bucket = bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_tok"))
    first_bucket = bucketed.groupBy("tok").agg(F.min("bucket").alias("fb"))
    new_vocab = first_bucket.groupBy(F.col("fb").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        per_bucket.join(new_vocab, "bucket", "left")
        .select(
            "bucket",
            F.sum("n_tok").over(w).cast("long").alias("tokens_cum"),
            F.sum(F.coalesce(F.col("n_new"), F.lit(0))).over(w).cast("long").alias("vocab_cum"),
        )
        .orderBy("bucket")
    )


@register(
    "ngram_novelty_by_doc",
    survey_ref="M5:text,§2.6,§2.7",
    oracle="""
WITH lists AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
grams AS (
  SELECT DISTINCT doc_id,
         l[x] || ' ' || l[x+1] || ' ' || l[x+2] || ' ' || l[x+3] || ' ' || l[x+4] AS g
  FROM lists, unnest(generate_series(1, len(l) - 4)) AS u(x)
),
first_doc AS (SELECT g, MIN(doc_id) AS fd FROM grams GROUP BY g)
SELECT grams.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN first_doc.fd = grams.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       ROUND(SUM(CASE WHEN first_doc.fd = grams.doc_id THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS novelty_frac
FROM grams JOIN first_doc USING (g)
GROUP BY grams.doc_id
""",
)
def q_ngram_novelty_by_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 5-gram novelty: the fraction of a document's
    distinct 5-grams whose corpus-wide first occurrence (min doc_id)
    is this document — the incremental-ingest signal a curation
    pipeline uses to decide whether a newly crawled document adds
    anything the corpus hasn't seen (complement of
    ``decontaminate_overlap``'s train/test direction).

    Scale shape: distinct (doc, gram) aggregate, gram-keyed MIN
    aggregate, and one gram-keyed join back — all hash exchanges on
    the gram key, no all-pairs and no sort. The distinct-per-doc step
    is what bounds the join fan-out for repetitive documents."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(F.col("text"), " ").alias("l"))
    # docs with <5 tokens contribute no 5-grams; without this guard
    # F.sequence(0, size-5) would emit a DESCENDING sequence and
    # F.slice would throw INVALID_PARAMETER_VALUE.START.
    grams = (
        toks.filter(F.size("l") >= 5)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("l") - 5),
                    lambda i: F.concat_ws(" ", F.slice(F.col("l"), i + 1, 5)),
                )
            ).alias("g"),
        )
        .distinct()
    )
    first_doc = grams.groupBy("g").agg(F.min("doc_id").alias("fd"))
    novel = F.sum(F.when(F.col("fd") == F.col("doc_id"), 1).otherwise(0))
    return (
        grams.join(first_doc, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            novel.cast("long").alias("n_novel"),
            F.round(novel * 1.0 / F.count(F.lit(1)), 6).alias("novelty_frac"),
        )
    )


_CDC_POW = [13163680, 805498697, 154885210, 362470373, 16974593, 66049, 257, 1]


def cdc_chunk_stream(d: DataFrame) -> DataFrame:
    """Content-defined chunking of a ``text`` column → one row per
    chunk (column ``chunk``). Boundary detection is a sliding 8-wide
    polynomial rolling hash (base 257 mod 1e9+7, cut at hash % 64 == 0)
    run as a vectorized Arrow kernel: Catalyst higher-order functions
    evaluate interpreted (ArrayFilter.eval, no codegen) and measured
    14.6 s at sf0.1, vs ~1 s for one np.frombuffer + 8 shifted
    multiply-adds per batch — exact int64 (max term 0x10FFFF·8.06e8 ≈
    8.9e14, 8-term sum < 2^63), bit-identical to the per-position SQL
    oracle formula with full-Unicode codepoints.
    Works on batch AND streaming DataFrames (stateless projection)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # NB: module has `from __future__ import annotations`, which turns
    # hints into strings pandas_udf can't inspect — set them post-hoc.
    def _cut_positions_fn(texts):
        pows = np.array(_CDC_POW, dtype=np.int64)
        out = []
        for t in texts:
            # utf-32-le gives one uint32 per character = the Unicode
            # codepoint, matching the DuckDB oracle's ascii() and the
            # pure-Python ord() test twin on non-Latin-1 text (latin-1
            # 'replace' mapped everything above U+00FF to '?').
            b = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
            n = len(b)
            if n < 9:
                out.append(np.empty(0, dtype=np.int64))
                continue
            # position i (1-based, 8..n-1) hashes chars [i-8, i) 0-based
            h = np.zeros(n - 8, dtype=np.int64)
            for k in range(8):
                h += b[k : k + n - 8] * pows[k]
            cuts = (np.arange(8, n, dtype=np.int64))[(h % 1000000007) % 64 == 0]
            out.append(cuts)
        return pd.Series(out)

    _cut_positions_fn.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    _cut_positions = pandas_udf(_cut_positions_fn, "array<long>")

    text = F.col("text")
    n = F.length(text)
    bounds = F.concat(
        F.array(F.lit(0).cast("long")),
        _cut_positions(text),
        F.array(n.cast("long")),
    )
    return d.select(text.alias("text"), bounds.alias("b")).select(
        F.explode(
            F.filter(
                F.transform(
                    F.sequence(F.lit(1), F.size("b") - 1),
                    lambda j: F.struct(
                        F.col("text")
                        .substr(
                            (F.element_at(F.col("b"), j) + 1).cast("int"),
                            (F.element_at(F.col("b"), j + 1) - F.element_at(F.col("b"), j)).cast(
                                "int"
                            ),
                        )
                        .alias("chunk"),
                        (F.element_at(F.col("b"), j + 1) - F.element_at(F.col("b"), j)).alias(
                            "clen"
                        ),
                    ),
                ),
                lambda s: s.clen > 0,
            )
        ).alias("s")
    ).select(F.col("s.chunk").alias("chunk"))


@register(
    "cdc_chunk_dedup",
    survey_ref="M5:dedup,§2.5,§2.6",
    oracle="""
WITH hashed AS (
  SELECT doc_id, text, LENGTH(text) AS n,
         list_filter(range(8, LENGTH(text)),
           i -> ((CAST(ascii(substring(text, i - 7, 1)) AS BIGINT) * 13163680
                + CAST(ascii(substring(text, i - 6, 1)) AS BIGINT) * 805498697
                + CAST(ascii(substring(text, i - 5, 1)) AS BIGINT) * 154885210
                + CAST(ascii(substring(text, i - 4, 1)) AS BIGINT) * 362470373
                + CAST(ascii(substring(text, i - 3, 1)) AS BIGINT) * 16974593
                + CAST(ascii(substring(text, i - 2, 1)) AS BIGINT) * 66049
                + CAST(ascii(substring(text, i - 1, 1)) AS BIGINT) * 257
                + CAST(ascii(substring(text, i, 1)) AS BIGINT)) % 1000000007) % 64 = 0)
           AS cuts
  FROM documents
),
bounds AS (
  SELECT doc_id, text,
         list_concat(list_concat([CAST(0 AS BIGINT)], cuts), [CAST(n AS BIGINT)]) AS b
  FROM hashed
),
chunks AS (
  SELECT substring(text, CAST(b[j] + 1 AS INTEGER), CAST(b[j + 1] - b[j] AS INTEGER)) AS chunk
  FROM bounds, unnest(range(1, len(b))) AS u(j)
  WHERE b[j + 1] > b[j]
),
per_chunk AS (
  SELECT chunk, CAST(COUNT(*) AS BIGINT) AS cnt, LENGTH(chunk) AS clen
  FROM chunks GROUP BY chunk
)
SELECT CAST(SUM(cnt) AS BIGINT) AS total_chunks,
       CAST(COUNT(*) AS BIGINT) AS distinct_chunks,
       CAST(SUM(cnt * clen) AS BIGINT) AS total_bytes,
       CAST(SUM((cnt - 1) * clen) AS BIGINT) AS dup_bytes,
       ROUND(SUM((cnt - 1) * clen) * 1.0 / SUM(cnt * clen), 6) AS dedup_ratio
FROM per_chunk
""",
)
def q_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined-chunking dedup (rsync/LBFS-style): cut every
    document into content-anchored chunks (``cdc_chunk_stream``), then
    dedup the chunk stream globally by content — the storage-level
    dedup estimate used when shingle/MinHash doc-level dedup
    (``minhash_lsh_neardup``) is too coarse, robust to insertions
    because boundaries are content-anchored, not offset-anchored.

    Scale shape: chunking is a stateless Arrow-kernel projection —
    zero shuffle, embarrassingly parallel; the only exchanges are the
    chunk-content hash aggregate and the final 1-row rollup. Chunk
    keys are content hashes, so skew is bounded by true duplication.
    At 100 TB this is a single pass over the text bytes plus one
    combine-heavy aggregate."""
    d = load_table(spark, sf_dir, "documents")
    per_chunk = (
        cdc_chunk_stream(d)
        .groupBy("chunk")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("cnt", F.length("chunk").alias("clen"))
    )
    return per_chunk.agg(
        F.sum("cnt").alias("total_chunks"),
        F.count(F.lit(1)).alias("distinct_chunks"),
        F.sum(F.col("cnt") * F.col("clen")).alias("total_bytes"),
        F.sum((F.col("cnt") - 1) * F.col("clen")).alias("dup_bytes"),
        F.round(
            F.sum((F.col("cnt") - 1) * F.col("clen")) * 1.0 / F.sum(F.col("cnt") * F.col("clen")),
            6,
        ).alias("dedup_ratio"),
    )


@register(
    "unigram_logprob_score",
    survey_ref="M5:text,§2.6,§2.7",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
vocab AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok
),
total AS (SELECT SUM(c) AS n FROM vocab),
cost AS (
  SELECT tok, CAST(ROUND(LN(c * 1.0 / total.n) * 1000000) AS BIGINT) AS inll
  FROM vocab, total
)
SELECT toks.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(-SUM(cost.inll) AS BIGINT) AS nll_micro_total,
       ROUND(-SUM(cost.inll) * 1.0 / (COUNT(*) * 1000000), 6) AS avg_nll
FROM toks JOIN cost USING (tok)
GROUP BY toks.doc_id
""",
)
def q_unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality filter (CCNet/KenLM-style, unigram
    order): train a unigram LM on the corpus itself (token → count /
    total), then score every document by its average negative
    log-likelihood — the classic 'drop the gibberish tail' signal in a
    training-data pipeline.

    Scale shape: one vocab-keyed count aggregate trains the LM; the
    scoring pass is a vocab-keyed join of the token stream against the
    (broadcastable) cost table plus a per-doc integer-sum aggregate.
    Per-token costs are fixed-point micro-nats (ROUND(ln·1e6) — one
    libm call per DISTINCT token, not per occurrence), so the per-doc
    SUM is exact BIGINT arithmetic with no float-order dependence; the
    single float division happens once per output row."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("n"))
    cost = vocab.crossJoin(F.broadcast(total)).select(
        "tok",
        F.round(F.log(F.col("c") * 1.0 / F.col("n")) * 1000000).cast("long").alias("inll"),
    )
    return (
        toks.join(F.broadcast(cost), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (-F.sum("inll")).cast("long").alias("nll_micro_total"),
            F.round(-F.sum("inll") * 1.0 / (F.count(F.lit(1)) * 1000000), 6).alias("avg_nll"),
        )
    )


@register(
    "quality_classifier_scoring",
    survey_ref="M5:text,T7,§2.6",
    oracle="""
WITH toks AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok FROM documents
),
feat AS (
  SELECT doc_id, source,
         (CAST(list_sum(list_transform(range(0, LEAST(LENGTH(tok), 8)),
              k -> ascii(tok[k+1]) * (31 ** k))) % 64 AS BIGINT)
          * 2654435761) % 1001 - 500 AS w
  FROM toks WHERE LENGTH(tok) > 0
),
per_doc AS (
  SELECT doc_id, source,
         (SUM(w) * 1000) // COUNT(*) AS iavg_milli
  FROM feat GROUP BY doc_id, source
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN iavg_milli >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       ROUND(SUM(CASE WHEN iavg_milli >= 0 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS keep_rate,
       CAST(SUM(iavg_milli) AS BIGINT) AS sum_iavg_milli
FROM per_doc
GROUP BY source
ORDER BY source
""",
)
def q_quality_classifier_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style linear quality classifier over hashed
    bag-of-words (the CCNet / RefinedWeb keep-drop gate): each token
    hashes into 64 buckets (same polynomial char hash as
    ``feature_hashing_counts``), a fixed Knuth-multiplicative weight
    table stands in for trained weights (deterministic, no model file),
    a document's score is the mean bucket weight, and keep = score>=0.
    Emits the per-source keep-rate audit a curation run reports.

    Scale shape: scoring is pure row-local integer column algebra
    (hash + weight lookup computed arithmetically — no vocabulary, no
    dictionary join, no broadcast state at all), then one doc-keyed
    and one source-keyed hash aggregate. All arithmetic is exact
    BIGINT (floor-div milli-score), so partial-aggregation order never
    shows."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).filter(F.length("tok") > 0)
    h = F.lit(0).cast("long")
    for k in range(8):
        code = F.when(
            F.length("tok") > k, F.ascii(F.substring("tok", k + 1, 1)).cast("long")
        ).otherwise(F.lit(0))
        h = h + code * F.lit(31**k)
    w = ((h % 64) * F.lit(2654435761)) % 1001 - 500
    per_doc = (
        toks.select("doc_id", "source", w.alias("w"))
        .groupBy("doc_id", "source")
        .agg(F.expr("(SUM(w) * 1000) DIV COUNT(*)").alias("iavg_milli"))
    )
    keep = F.sum(F.when(F.col("iavg_milli") >= 0, 1).otherwise(0))
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            keep.cast("long").alias("n_keep"),
            F.round(keep * 1.0 / F.count(F.lit(1)), 6).alias("keep_rate"),
            F.sum("iavg_milli").cast("long").alias("sum_iavg_milli"),
        )
        .orderBy("source")
    )


@register(
    "bpe_encode_fertility",
    survey_ref="M5:text,§2.4,§2.6",
    oracle="""
WITH words AS (
  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
),
spaced AS (
  SELECT source, w,
         ' ' || array_to_string(list_transform(range(1, LENGTH(w) + 1),
                                i -> substring(w, i, 1)), ' ') || ' ' AS s
  FROM words WHERE LENGTH(w) > 0
),
merged AS (
  SELECT source, w,
         replace(replace(replace(replace(replace(replace(
           s, ' e r ', ' er '), ' i n ', ' in '), ' o w ', ' ow '),
              ' o r ', ' or '), ' s t ', ' st '), ' e r ', ' er ') AS m
  FROM spaced
),
pieces AS (
  SELECT source, LENGTH(w) AS n_chars,
         LEN(string_split(TRIM(m), ' ')) AS n_pieces
  FROM merged
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       CAST(SUM(n_pieces) AS BIGINT) AS n_pieces,
       ROUND(SUM(n_pieces) * 1.0 / COUNT(*), 6) AS fertility,
       ROUND(SUM(n_pieces) * 1.0 / SUM(n_chars), 6) AS compression
FROM pieces
GROUP BY source ORDER BY source
""",
)
def q_bpe_encode_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE (the apply side of ``bpe_merge_training``): segment
    every word with a fixed 5-merge table (er,in,ow,or,st — the top
    pairs the training query learns on this corpus, frozen as the
    tokenizer artifact) by the standard rank-order greedy merge —
    char-spaced string, sequential ' a b '→' ab ' replaces, with the
    top-rank merge re-applied after the table (second 'er' pass mirrors
    rank-order re-scanning for merges re-enabled by later ones). Emits
    the per-source fertility (pieces/word) and compression
    (pieces/char) report a tokenizer rollout reviews.

    Scale shape: pure row-local string algebra (explode → chained
    replace — whole-stage codegen, no UDF, no model broadcast), then
    one source-keyed aggregate. Counts are exact integers; the two
    ratios are single end divisions."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select("source", F.explode(F.split(F.col("text"), " ")).alias("w")).filter(
        F.length("w") > 0
    )
    spaced = F.concat(
        F.lit(" "),
        F.array_join(F.split(F.col("w"), ""), " "),
        F.lit(" "),
    )
    m = spaced
    for a, b in [("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"), ("e", "r")]:
        m = F.replace(m, F.lit(f" {a} {b} "), F.lit(f" {a}{b} "))
    pieces = words.select(
        "source",
        F.length("w").alias("n_chars"),
        F.size(F.split(F.trim(m), " ")).alias("n_pieces"),
    )
    return (
        pieces.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_chars").alias("n_chars"),
            F.sum("n_pieces").alias("n_pieces"),
            F.round(F.sum("n_pieces") * 1.0 / F.count(F.lit(1)), 6).alias("fertility"),
            F.round(F.sum("n_pieces") * 1.0 / F.sum("n_chars"), 6).alias("compression"),
        )
        .orderBy("source")
    )


@register(
    "source_vocab_overlap",
    survey_ref="M5:dedup,§2.6,§2.7",
    oracle="""
WITH vs AS (
  SELECT DISTINCT source, tok
  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
),
vocab_n AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM vs GROUP BY source
),
inter AS (
  SELECT a.source AS s1, b.source AS s2, CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM vs a JOIN vs b ON a.tok = b.tok AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT s1, s2, n_inter,
       (v1.n + v2.n - n_inter) AS n_union,
       ROUND(n_inter * 1.0 / (v1.n + v2.n - n_inter), 6) AS jaccard
FROM inter
JOIN vocab_n v1 ON v1.source = s1
JOIN vocab_n v2 ON v2.source = s2
ORDER BY jaccard DESC, s1, s2
LIMIT 20
""",
)
def q_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source vocabulary Jaccard matrix: which data sources
    share a vocabulary (the corpus-composition / contamination
    diagnostic run before mixing sources into a training blend) — set
    intersection via a token-keyed self-join of DISTINCT (source,
    token), union by inclusion-exclusion from per-source vocabulary
    sizes, top-20 most-overlapping pairs.

    Scale shape: the distinct projection collapses the token stream
    to vocabulary scale FIRST, so the self-join's fan-out is bounded
    by (sources-per-token choose 2) <= 190 per vocab entry, never by
    occurrences; per-source sizes are a 20-row broadcast. All counts
    exact integers; one division per emitted pair."""
    d = load_table(spark, sf_dir, "documents")
    vs = d.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).distinct()
    vocab_n = vs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = vs.alias("a")
    b = vs.alias("b")
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("s1"), F.col("b.source").alias("s2"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    v1 = vocab_n.select(F.col("source").alias("s1"), F.col("n").alias("n1"))
    v2 = vocab_n.select(F.col("source").alias("s2"), F.col("n").alias("n2"))
    uni = F.col("n1") + F.col("n2") - F.col("n_inter")
    return (
        inter.join(F.broadcast(v1), "s1")
        .join(F.broadcast(v2), "s2")
        .select(
            "s1",
            "s2",
            "n_inter",
            uni.alias("n_union"),
            F.round(F.col("n_inter") * 1.0 / uni, 6).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "s1", "s2")
        .limit(20)
    )


@register(
    "reciprocal_rank_fusion",
    survey_ref="M5:similarity,§2.7,§2.8",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks WHERE term IN ('scan', 'join', 'window')
  GROUP BY doc_id, term
),
lex_score AS (
  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS s FROM tf GROUP BY doc_id
),
lex_rank AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS r
  FROM lex_score QUALIFY r <= 50
),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
sem AS (
  SELECT e.vec_id AS doc_id,
         CAST(ROUND(
           list_sum(list_transform(range(1, 65),
                    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))
           / (SQRT(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
              * SQRT(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
           * 1000000) AS BIGINT) AS icos
  FROM embeddings e, q WHERE e.vec_id <> 0
),
sem_rank AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY icos DESC, doc_id) AS r
  FROM sem QUALIFY r <= 50
),
fused AS (
  SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
         COALESCE(1.0 / (60 + l.r), 0.0) + COALESCE(1.0 / (60 + s.r), 0.0) AS rrf,
         l.r AS lex_r, s.r AS sem_r
  FROM lex_rank l FULL OUTER JOIN sem_rank s ON l.doc_id = s.doc_id
)
SELECT doc_id, ROUND(rrf, 6) AS rrf_score,
       CAST(COALESCE(lex_r, -1) AS BIGINT) AS lex_rank,
       CAST(COALESCE(sem_r, -1) AS BIGINT) AS sem_rank
FROM fused
ORDER BY rrf_score DESC, doc_id
LIMIT 10
""",
)
def q_reciprocal_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retrieval reciprocal-rank fusion (Cormack et al. 2009):
    fuse a lexical ranking (term-frequency hits on the fixed query
    {scan, join, window} over ``documents``) with a semantic ranking
    (cosine to query vector 0 over ``embeddings``, integer-encoded as
    in ``semdedup_cluster_prune``) via RRF(k=60) over the two top-50
    lists — the standard RAG retrieval stack (BM25 ⊕ dense) as one
    declarative plan.

    Scale shape: each leg reduces the corpus to a 50-row ranked list
    (TakeOrderedAndProject after one aggregate / one broadcast scoring
    pass); the fusion full-outer join and re-sort touch <= 100 rows.
    The RRF sum is a fixed-order two-term row-local float add on
    integer ranks — no order-dependent aggregation anywhere."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    toks = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
    lex_score = (
        toks.filter(F.col("term").isin("scan", "join", "window"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("s"))
    )
    w_lex = Window.orderBy(F.desc("s"), F.asc("doc_id"))
    lex_rank = (
        lex_score.orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(50)
        .withColumn("r", F.row_number().over(w_lex))
        .select("doc_id", F.col("r").alias("lex_r"))
    )
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    cos = _vec_dot(F.col("embedding"), F.col("qe")) / (
        F.sqrt(_vec_sq_norm(F.col("embedding"))) * F.sqrt(_vec_sq_norm(F.col("qe")))
    )
    sem = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(F.col("vec_id").alias("doc_id"), F.round(cos * 1000000).cast("long").alias("icos"))
    )
    w_sem = Window.orderBy(F.desc("icos"), F.asc("doc_id"))
    sem_rank = (
        sem.orderBy(F.desc("icos"), F.asc("doc_id"))
        .limit(50)
        .withColumn("r", F.row_number().over(w_sem))
        .select("doc_id", F.col("r").alias("sem_r"))
    )
    fused = lex_rank.join(sem_rank, "doc_id", "full_outer").select(
        "doc_id",
        (
            F.coalesce(1.0 / (60 + F.col("lex_r")), F.lit(0.0))
            + F.coalesce(1.0 / (60 + F.col("sem_r")), F.lit(0.0))
        ).alias("rrf"),
        "lex_r",
        "sem_r",
    )
    return (
        fused.select(
            "doc_id",
            F.round("rrf", 6).alias("rrf_score"),
            F.coalesce(F.col("lex_r"), F.lit(-1)).cast("long").alias("lex_rank"),
            F.coalesce(F.col("sem_r"), F.lit(-1)).cast("long").alias("sem_rank"),
        )
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(10)
    )


@register(
    "rake_keyword_scores",
    survey_ref="M5:text,§2.6,§2.8",
    oracle="""
WITH lists AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
toks AS (
  SELECT doc_id, x AS pos, l[x] AS tok
  FROM lists, unnest(generate_series(1, len(l))) AS u(x)
),
content AS (
  SELECT doc_id, pos, tok,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM toks
  WHERE tok NOT IN ('the', 'a', 'and', 'of', 'to', 'in', 'is')
),
phrase_len AS (
  SELECT doc_id, island, CAST(COUNT(*) AS BIGINT) AS plen
  FROM content GROUP BY doc_id, island
),
word_stats AS (
  SELECT c.tok,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(p.plen) AS BIGINT) AS degree
  FROM content c JOIN phrase_len p USING (doc_id, island)
  GROUP BY c.tok
  HAVING COUNT(*) >= 5
)
SELECT tok, freq, degree, ROUND(degree * 1.0 / freq, 6) AS rake_score
FROM word_stats
ORDER BY rake_score DESC, tok
LIMIT 20
""",
)
def q_rake_keyword_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): split each document
    into candidate phrases at stopword boundaries (gaps-and-islands
    over token positions), then score every content word by
    degree/frequency — degree being the summed length of the phrases
    it appears in — and emit the top-20 corpus keywords. The classic
    no-model keyword extractor a curation pipeline runs for corpus
    topic profiling.

    Scale shape: the island id is a doc-keyed window (natural
    partition key, no global sort); phrase lengths and word stats are
    hash aggregates keyed by (doc, island) and token; the final
    ranking is TakeOrderedAndProject over the >=5-frequency vocab.
    freq/degree are exact integers, one division per emitted row."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    content = toks.filter(
        ~F.col("tok").isin("the", "a", "and", "of", "to", "in", "is")
    ).withColumn(
        "island",
        F.col("pos")
        - F.row_number().over(Window.partitionBy("doc_id").orderBy("pos")),
    )
    phrase_len = content.groupBy("doc_id", "island").agg(
        F.count(F.lit(1)).alias("plen")
    )
    word_stats = (
        content.join(phrase_len, ["doc_id", "island"])
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("degree"))
        .filter(F.col("freq") >= 5)
    )
    return (
        word_stats.select(
            "tok",
            "freq",
            "degree",
            F.round(F.col("degree") * 1.0 / F.col("freq"), 6).alias("rake_score"),
        )
        .orderBy(F.desc("rake_score"), F.asc("tok"))
        .limit(20)
    )


@register(
    "zipf_exponent_fit",
    survey_ref="M5:text,§2.6,§2.9",
    oracle="""
WITH freq AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY tok
  ORDER BY c DESC, tok
  LIMIT 100
),
ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS r FROM freq
),
pts AS (
  SELECT CAST(ROUND(LN(r) * 1000000) AS BIGINT) AS x,
         CAST(ROUND(LN(c) * 1000000) AS BIGINT) AS y
  FROM ranked
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM pts
)
SELECT n,
       ROUND((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx), 6) AS zipf_slope,
       ROUND((sy * 1.0 / n - (n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx) * sx / n)
             / 1000000.0, 6) AS log_intercept
FROM s
""",
)
def q_zipf_exponent_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law exponent fit: least-squares slope of log(freq) vs
    log(rank) over the top-100 vocabulary — the corpus-health statistic
    (natural language sits near -1; template/boilerplate-heavy corpora
    flatten) that complements ``heaps_law_vocab_growth`` on the
    profiling surface.

    Scale shape: one vocab-keyed count aggregate reduced by
    TakeOrderedAndProject to 100 rows; the regression runs on exact
    integer sufficient statistics (micro-log fixed point per rank, so
    SUM order is immaterial; max |x·y| ≈ (2e7)² = 4e14 × 100 rows
    < 2^63); the two divisions happen once in the 1-row projection."""
    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("tok"))
        .limit(100)
    )
    ranked = freq.withColumn(
        "r", F.row_number().over(Window.orderBy(F.desc("c"), F.asc("tok")))
    )
    pts = ranked.select(
        F.round(F.log("r") * 1000000).cast("long").alias("x"),
        F.round(F.log("c") * 1000000).cast("long").alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) * 1.0 / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        "n",
        F.round(slope, 6).alias("zipf_slope"),
        F.round(
            (F.col("sy") * 1.0 / F.col("n") - slope * F.col("sx") / F.col("n")) / 1000000.0, 6
        ).alias("log_intercept"),
    )


@register(
    "sliding_window_split",
    survey_ref="M5:text,§2.5,§2.6",
    oracle="""
WITH lists AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
wins AS (
  SELECT doc_id, len(l) AS n_tokens,
         CASE WHEN len(l) <= 32 THEN 1
              ELSE (len(l) - 32 + 23) // 24 + 1 END AS n_windows
  FROM lists
)
SELECT CAST(SUM(n_windows) AS BIGINT) AS total_windows,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(CASE WHEN n_tokens <= 32 THEN 32 - n_tokens ELSE
            (CASE WHEN (n_tokens - 32) % 24 = 0 THEN 0
                  ELSE 24 - (n_tokens - 32) % 24 END) END) AS BIGINT) AS pad_tokens,
       CAST(SUM(n_windows * 32 - CASE WHEN n_tokens <= 32 THEN n_tokens
            ELSE 32 + ((n_windows - 1) * 24) END) AS BIGINT) AS overlap_plus_pad,
       ROUND(SUM(n_tokens) * 1.0 / (SUM(n_windows) * 32), 6) AS fill_ratio
FROM wins
""",
)
def q_sliding_window_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window accounting for sliding-window document splitting
    (window 32 tokens, stride 24 — the 25%-overlap chunking an LLM
    training/RAG pipeline applies to long documents before embedding):
    windows per doc in closed form, padding waste of the final window,
    and overall fill ratio — the budget numbers that decide the
    window/stride trade BEFORE materializing the split (complement of
    ``pack_sequences``, which packs SHORT docs; this splits LONG ones,
    and ``chunk_documents_hof`` which materializes fixed chunks).

    Scale shape: pure row-local integer arithmetic on token counts —
    no explode, no shuffle except the final 1-row rollup. The closed
    form (ceil((n-W)/S)+1) avoids materializing a window list at all."""
    d = load_table(spark, sf_dir, "documents")
    n = F.size(F.split(F.col("text"), " "))
    n_windows = F.when(n <= 32, 1).otherwise(F.expr(
        "(size(split(text, ' ')) - 32 + 23) DIV 24 + 1"
    ))
    last_fill = F.when(n <= 32, 32 - n).otherwise(
        F.when((n - 32) % 24 == 0, 0).otherwise(24 - (n - 32) % 24)
    )
    wins = d.select(
        n.alias("n_tokens"),
        n_windows.alias("n_windows"),
        last_fill.alias("pad"),
    )
    return wins.agg(
        F.sum("n_windows").alias("total_windows"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("pad").alias("pad_tokens"),
        F.sum(
            F.col("n_windows") * 32
            - F.when(F.col("n_tokens") <= 32, F.col("n_tokens")).otherwise(
                32 + (F.col("n_windows") - 1) * 24
            )
        ).alias("overlap_plus_pad"),
        F.round(F.sum("n_tokens") * 1.0 / (F.sum("n_windows") * 32), 6).alias("fill_ratio"),
    )


@register(
    "tokenizer_oov_rate",
    survey_ref="M5:text,§2.6,§2.7",
    oracle="""
WITH vocab AS (
  SELECT tok FROM (
    SELECT tok, COUNT(*) AS c
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok ORDER BY c DESC, tok LIMIT 100
  )
),
toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       ROUND(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS oov_rate
FROM toks LEFT JOIN vocab v USING (tok)
GROUP BY source
ORDER BY source
""",
)
def q_tokenizer_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per source against a top-100 frequency
    vocabulary (the fixed-vocab tokenizer acceptance metric: which
    sources will fragment into UNKs/bytes) — pairs with
    ``bpe_encode_fertility`` (subword cost) and ``lang_stopword_rate``
    on the per-source tokenizer-rollout report.

    Scale shape: the vocabulary is a top-k aggregate reduced to 100
    rows and broadcast back onto the token stream (LEFT join on the
    token key); one source-keyed aggregate finishes. Counts exact,
    one division per source."""
    d = load_table(spark, sf_dir, "documents")
    toks_all = d.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
    vocab = (
        toks_all.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("tok"))
        .limit(100)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    toks = d.select("source", F.explode(F.split(F.col("text"), " ")).alias("tok"))
    oov = F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            oov.cast("long").alias("n_oov"),
            F.round(oov * 1.0 / F.count(F.lit(1)), 6).alias("oov_rate"),
        )
        .orderBy("source")
    )


@register(
    "dup_cluster_size_histogram",
    survey_ref="M5:dedup,§2.6",
    oracle="""
WITH clusters AS (
  SELECT text, CAST(COUNT(*) AS BIGINT) AS sz FROM documents GROUP BY text
)
SELECT sz AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(sz) AS BIGINT) AS n_docs,
       CAST(SUM(sz - 1) AS BIGINT) AS n_removable
FROM clusters
GROUP BY sz ORDER BY sz
""",
)
def q_dup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate cluster-size distribution: how many documents
    sit in clusters of size 1, 2, 3, ... and how many rows dedup would
    remove — the shape report that distinguishes 'a few viral pages
    copied 10k times' (heavy tail → salting needed on the dedup key)
    from 'pairwise mirror copies' (uniform 2s). Read alongside
    ``dedup_exact`` (which keeps one per cluster) and
    ``join_size_from_degrees`` (the same skew statistic for joins).

    Scale shape: two hash aggregates — content key, then size key
    (output bounded by the largest cluster) — both map-side
    combinable; no joins, no windows."""
    d = load_table(spark, sf_dir, "documents")
    clusters = d.groupBy("text").agg(F.count(F.lit(1)).alias("sz"))
    return (
        clusters.groupBy("sz")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("sz").alias("n_docs"),
            F.sum(F.col("sz") - 1).alias("n_removable"),
        )
        .select(
            F.col("sz").alias("cluster_size"),
            "n_clusters",
            "n_docs",
            "n_removable",
        )
        .orderBy("cluster_size")
    )


@register(
    "dataset_datasheet_report",
    survey_ref="M5:text,§2.6",
    oracle="""
WITH per_doc AS (
  SELECT source, lang, doc_id, n_chars,
         LEN(string_split(text, ' ')) AS n_tokens,
         text
  FROM documents
),
dups AS (
  SELECT text, COUNT(*) AS c FROM per_doc GROUP BY text
)
SELECT p.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT p.lang) AS BIGINT) AS n_langs,
       CAST(SUM(p.n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(p.n_chars) AS BIGINT) AS n_chars,
       CAST(MIN(p.n_tokens) AS BIGINT) AS min_tokens,
       CAST(MAX(p.n_tokens) AS BIGINT) AS max_tokens,
       CAST(SUM(CASE WHEN d.c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_in_dup_cluster,
       ROUND(SUM(CASE WHEN d.c > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS dup_frac
FROM per_doc p JOIN dups d USING (text)
GROUP BY p.source
ORDER BY p.source
""",
)
def q_dataset_datasheet_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Datasheets for datasets' (Gebru et al. 2021) per-source
    summary: document/token/char volumes, token-length extrema,
    language count, and the fraction of documents sitting in an exact-
    duplicate cluster — the one-table composition card published with
    a training-data release.

    Scale shape: one content-keyed aggregate for dup-cluster sizes
    joined back on the content key (hash join, no fan-out: one row per
    doc), one source-keyed rollup. All counts exact integers."""
    d = load_table(spark, sf_dir, "documents")
    per_doc = d.select(
        "source",
        "lang",
        "n_chars",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        "text",
    )
    dups = d.groupBy("text").agg(F.count(F.lit(1)).alias("c"))
    in_dup = F.sum(F.when(F.col("c") > 1, 1).otherwise(0))
    return (
        per_doc.join(dups, "text")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("n_chars").alias("n_chars"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            in_dup.cast("long").alias("n_in_dup_cluster"),
            F.round(in_dup * 1.0 / F.count(F.lit(1)), 6).alias("dup_frac"),
        )
        .orderBy("source")
    )


@register(
    "negative_sampling_table",
    survey_ref="M5:text,§2.6,§2.9",
    oracle="""
WITH freq AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY tok ORDER BY c DESC, tok LIMIT 50
),
powed AS (
  SELECT tok, c, CAST(ROUND(EXP(0.75 * LN(c)) * 1000000) AS BIGINT) AS w
  FROM freq
),
tot AS (SELECT SUM(w) AS tw FROM powed),
alloc AS (
  SELECT tok, c, w,
         (w * 1000) // tot.tw AS base,
         (w * 1000) % tot.tw AS rem
  FROM powed, tot
),
ranked AS (
  SELECT tok, c, base,
         ROW_NUMBER() OVER (ORDER BY rem DESC, tok) AS rr
  FROM alloc
),
short AS (
  SELECT 1000 - SUM(base) AS missing FROM ranked
)
SELECT tok, c,
       CAST(base + CASE WHEN rr <= short.missing THEN 1 ELSE 0 END AS BIGINT) AS table_slots
FROM ranked, short
ORDER BY table_slots DESC, tok
""",
)
def q_negative_sampling_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec-style negative-sampling table: allocate 1000 sampling
    slots across the top-50 vocabulary proportional to count^0.75 (the
    Mikolov smoothing that keeps rare words sampleable), with exact
    integer slot totals via largest-remainder apportionment — the
    precomputed table a skip-gram/contrastive trainer draws negatives
    from.

    Scale shape: one vocab aggregate reduced to 50 rows by
    TakeOrderedAndProject; everything after (fixed-point ^0.75 powers,
    one ln/exp per vocab entry, remainder ranking over 50 rows) is
    bounded-size arithmetic. Slot math is exact BIGINT, so the 1000
    slots always sum exactly (the property floor-only allocation
    loses)."""
    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("tok"))
        .limit(50)
    )
    powed = freq.select(
        "tok", "c", F.round(F.exp(0.75 * F.log("c")) * 1000000).cast("long").alias("w")
    )
    tot = powed.agg(F.sum("w").alias("tw"))
    alloc = powed.crossJoin(F.broadcast(tot)).select(
        "tok",
        "c",
        F.expr("(w * 1000) DIV tw").alias("base"),
        F.expr("(w * 1000) % tw").alias("rem"),
    )
    ranked = alloc.withColumn(
        "rr", F.row_number().over(Window.orderBy(F.desc("rem"), F.asc("tok")))
    )
    short = ranked.agg((F.lit(1000) - F.sum("base")).alias("missing"))
    return (
        ranked.crossJoin(F.broadcast(short))
        .select(
            "tok",
            "c",
            (F.col("base") + F.when(F.col("rr") <= F.col("missing"), 1).otherwise(0))
            .cast("long")
            .alias("table_slots"),
        )
        .orderBy(F.desc("table_slots"), F.asc("tok"))
    )


@register(
    "containment_query_search",
    survey_ref="M5:dedup,§2.7,§2.9",
    oracle="""
WITH q AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE doc_id = 0
),
qn AS (SELECT CAST(COUNT(*) AS BIGINT) AS nq FROM q),
cand AS (
  SELECT d.doc_id, CAST(COUNT(DISTINCT t.tok) AS BIGINT) AS n_inter
  FROM documents d, unnest(string_split(d.text, ' ')) AS u(tok)
  JOIN q t ON t.tok = u.tok
  WHERE d.doc_id <> 0
  GROUP BY d.doc_id
)
SELECT cand.doc_id, n_inter, qn.nq,
       ROUND(n_inter * 1.0 / qn.nq, 6) AS containment
FROM cand, qn
ORDER BY containment DESC, doc_id
LIMIT 10
""",
)
def q_containment_query_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment search (asymmetric Jaccard |A∩B|/|A|, Broder's
    containment): which documents CONTAIN most of query document 0's
    vocabulary — the measure that catches partial copies, quotations,
    and boilerplate embedding that symmetric Jaccard
    (``minhash_lsh_neardup``) under-scores when the containing
    document is much longer.

    Scale shape: the query's distinct-token set is a broadcast
    relation; candidates come from a token-keyed semi-join of the
    token stream against it (only docs sharing >= 1 query token
    survive — the inverted-index probe), then one doc-keyed distinct
    count and TakeOrderedAndProject. No all-pairs: one query vs
    corpus is index-probe-shaped by construction."""
    d = load_table(spark, sf_dir, "documents")
    q = (
        d.filter(F.col("doc_id") == 0)
        .select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .distinct()
    )
    qn = q.agg(F.count(F.lit(1)).alias("nq"))
    toks = d.filter(F.col("doc_id") != 0).select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    cand = (
        toks.join(F.broadcast(q), "tok")
        .groupBy("doc_id")
        .agg(F.countDistinct("tok").alias("n_inter"))
    )
    return (
        cand.crossJoin(F.broadcast(qn))
        .select(
            "doc_id",
            "n_inter",
            "nq",
            F.round(F.col("n_inter") * 1.0 / F.col("nq"), 6).alias("containment"),
        )
        .orderBy(F.desc("containment"), F.asc("doc_id"))
        .limit(10)
    )


@register(
    "epoch_shuffle_order",
    survey_ref="X3,X4,§2.9",
    oracle="""
WITH perm AS (
  SELECT e.epoch, d.doc_id,
         ((d.doc_id % 1000003) * 31 + e.epoch * 7 + 13) * 2654435761 % 1000000007 AS h
  FROM documents d, (SELECT unnest([0, 1, 2]) AS epoch) e
),
ranked AS (
  SELECT epoch, doc_id, h,
         ROW_NUMBER() OVER (PARTITION BY epoch ORDER BY h, doc_id) AS pos
  FROM perm
)
SELECT epoch, CAST(pos AS BIGINT) AS pos, doc_id
FROM ranked WHERE pos <= 10
ORDER BY epoch, pos
""",
)
def q_epoch_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded per-epoch shuffle order (the X3/X4 primitive at training
    time): each epoch permutes the corpus by a deterministic integer
    hash of (doc_id, epoch) — same data, different order every epoch,
    reproducible across reruns and executors — and emits each epoch's
    first 10 examples as the verification prefix.

    Scale shape: the permutation KEY is pure row-local integer algebra
    (no stored permutation, no shuffle to generate randomness); the
    top-10-per-epoch comes from a window over the 3 epoch replicas —
    at fixture scale a 3-partition window is acceptable because the
    emitted prefix is tiny, and at 100 TB the same hash key IS the
    sort key a shard writer distributes by (range partition on h), so
    nothing about the construction requires a global sort."""
    d = load_table(spark, sf_dir, "documents")
    epochs = spark.range(3).select(F.col("id").cast("int").alias("epoch"))
    perm = d.select("doc_id").crossJoin(F.broadcast(epochs)).select(
        "epoch",
        "doc_id",
        (
            ((F.col("doc_id") % 1000003) * 31 + F.col("epoch") * 7 + 13)
            * F.lit(2654435761)
            % 1000000007
        ).alias("h"),
    )
    # top-10 per epoch without a fact-scale few-key window: prefilter
    # candidates with a per-epoch rank bound via TakeOrdered on the
    # union of 3 bounded branches.
    branches = []
    for ep in range(3):
        w = Window.orderBy("h", "doc_id")
        b = (
            perm.filter(F.col("epoch") == ep)
            .orderBy("h", "doc_id")
            .limit(10)
            .withColumn("pos", F.row_number().over(w))
            .select("epoch", F.col("pos").cast("long").alias("pos"), "doc_id")
        )
        branches.append(b)
    out = branches[0]
    for b in branches[1:]:
        out = out.unionAll(b)
    return out.orderBy("epoch", "pos")


# ---------------------------------------------------------------------------
# Exact substring deduplication (suffix-adjacency / LCP family).
#
# The canonical LLM-data operator from Lee et al. 2022 ("Deduplicating
# Training Data Makes Language Models Better", arXiv:2107.06499): find
# every maximal text span of >= L tokens that occurs more than once in
# the corpus, report/remove it. The paper builds a monolithic suffix
# array and scans adjacent suffixes for long common prefixes; the
# Spark-first rendering below is equivalent for a fixed threshold L:
# a span of length m >= L is duplicated iff every L-token gram inside
# it is duplicated, so (1) explode each doc into its L-token grams
# (pure column ops — sequence + slice, no UDF), (2) one hash exchange
# keyed by the gram marks duplicated start positions (COUNT(*) OVER
# gram > 1 — this exchange is the event x doclen-scale shuffle every
# exact-substring dedup pays; the paper pays it as a global suffix
# SORT, a hash exchange is strictly cheaper), (3) a per-doc interval
# merge (running-max window over co-partitioned doc_id) recovers the
# MAXIMAL duplicated spans. No all-pairs join anywhere; the gram
# table is the one big intermediate (~L x token stream) and at 100 TB
# a production variant would carry xxhash64(gram) as the exchange key
# instead of the string (collisions only ever mark a FALSE duplicate
# span candidate, which re-verification removes) — the oracle-paired
# queries keep the string key so DuckDB reproduces them bit-for-bit.
# ---------------------------------------------------------------------------

_SUB_L = 8  # duplicate-substring threshold, in tokens (paper: 50 BPE tokens)

# Shared oracle CTEs: token arrays -> L-gram start positions.
SUBSTR_GRAM_CTE = f"""
tarr AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         LEN(string_split(text, ' ')) AS n
  FROM documents
),
grams AS (
  SELECT doc_id, i AS p,
         array_to_string(list_slice(t, i, i + {_SUB_L - 1}), ' ') AS gram
  FROM tarr, UNNEST(range(1, n - {_SUB_L} + 2)) AS r(i)
  WHERE n >= {_SUB_L}
)"""


def _sql_islands(src: str) -> str:
    """isl+spans CTE text: gaps-and-islands interval merge (running
    max) over a (doc_id, p, e) source CTE — shared by every oracle."""
    return f"""
isl AS (
  SELECT doc_id, p, e,
         CASE WHEN p > COALESCE(MAX(e) OVER (
                PARTITION BY doc_id ORDER BY p
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
              THEN 1 ELSE 0 END AS ni
  FROM {src}
),
spans AS (
  SELECT doc_id, island,
         MIN(p) AS span_start, MAX(e) AS span_end
  FROM (SELECT doc_id, p, e,
               SUM(ni) OVER (PARTITION BY doc_id ORDER BY p
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM isl) x
  GROUP BY doc_id, island
)"""


# grams -> duplicated start positions -> maximal merged spans.
# Public: shared with streaming_queries.stream_substring_dup_rate.
_SUBSTR_GRAM_CTE = SUBSTR_GRAM_CTE  # deprecated private alias

_SUBSTR_SPAN_CTE = f"""{SUBSTR_GRAM_CTE},
dup AS (
  SELECT doc_id, p, p + {_SUB_L - 1} AS e
  FROM (SELECT doc_id, p,
               COUNT(*) OVER (PARTITION BY gram) AS cnt
        FROM grams) g
  WHERE cnt > 1
),{_sql_islands("dup")}"""

# Excise CTE tail shared by the removal-policy oracles: positions
# covered by (per-doc disjoint) spans are dropped, survivors re-join.
_SQL_EXCISE_TAIL = """
covered AS (
  SELECT doc_id, j AS pos
  FROM spans, UNNEST(range(span_start, span_end + 1)) AS r(j)
),
tokpos AS (
  SELECT doc_id, i AS pos, t[i] AS tok
  FROM tarr, UNNEST(range(1, n + 1)) AS r(i)
)
SELECT tp.doc_id,
       COALESCE(STRING_AGG(CASE WHEN c.pos IS NULL THEN tp.tok END, ' '
                           ORDER BY tp.pos), '') AS clean_text,
       CAST(SUM(CASE WHEN c.pos IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         AS n_removed
FROM tokpos tp
LEFT JOIN covered c ON tp.doc_id = c.doc_id AND tp.pos = c.pos
GROUP BY tp.doc_id"""


def gram_project(d: DataFrame) -> DataFrame:
    """(doc_id, p, gram): every L-token gram start position — pure
    column ops (sequence + slice), map-side, no exchange. Stateless,
    so it applies unchanged to a STREAMING documents frame (see
    stream_substring_dup_rate)."""
    L = _SUB_L
    toks = d.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= L
    )
    return toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("t") - L + 1)).alias("p"),
        "t",
    ).select(
        "doc_id",
        "p",
        F.concat_ws(" ", F.slice(F.col("t"), F.col("p"), F.lit(L))).alias("gram"),
    )


def _doc_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gram_project(load_table(spark, sf_dir, "documents"))


def _merge_spans(dup: DataFrame) -> DataFrame:
    """Maximal spans from duplicated start positions (doc_id, p, e):
    gaps-and-islands interval merge, co-partitioned on doc_id.

    Contiguity rule: COVERAGE contiguity — a new island starts only
    when p > prev_max_end + 1, so two duplicated windows whose covered
    token ranges abut exactly (start gap == L) merge into ONE maximal
    region, matching the strict 'maximal contiguous duplicated region'
    reading of the corpus docstrings. The DuckDB oracle CTE
    (_sql_islands) mirrors the same rule."""
    wo = Window.partitionBy("doc_id").orderBy("p")
    prev_max_end = F.max("e").over(wo.rowsBetween(Window.unboundedPreceding, -1))
    isl = dup.withColumn(
        "ni",
        F.when(
            F.col("p") > F.coalesce(prev_max_end, F.lit(-2)) + 1, 1
        ).otherwise(0),
    ).withColumn(
        "island", F.sum("ni").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    )
    return isl.groupBy("doc_id", "island").agg(
        F.min("p").alias("span_start"), F.max("e").alias("span_end")
    )


def _substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated spans (doc_id, span_start, span_end) — the
    shared Spark plan behind the substring-dedup corpus queries."""
    grams = _doc_grams(spark, sf_dir)
    wg = Window.partitionBy("gram")
    dup = (
        grams.withColumn("cnt", F.count(F.lit(1)).over(wg))
        .filter(F.col("cnt") > 1)
        .select("doc_id", "p", (F.col("p") + _SUB_L - 1).alias("e"))
    )
    return _merge_spans(dup)


_SUBSTR_LCP_ORACLE = f"""
WITH {_SUBSTR_SPAN_CTE}
SELECT s.doc_id,
       CAST(ANY_VALUE(tarr.n) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
       CAST(SUM(span_end - span_start + 1) AS BIGINT) AS dup_tokens,
       CAST(MAX(span_end - span_start + 1) AS BIGINT) AS longest_span,
       ROUND(SUM(span_end - span_start + 1) * 1.0 / ANY_VALUE(tarr.n), 6)
         AS dup_fraction
FROM spans s JOIN tarr USING (doc_id)
GROUP BY s.doc_id
"""


def _lcp_stats(spans: DataFrame, d: DataFrame) -> DataFrame:
    """Per-doc span statistics shared by the exact and fast variants."""
    n_tok = d.select("doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
    span_len = F.col("span_end") - F.col("span_start") + 1
    stats = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_spans"),
        F.sum(span_len).cast("long").alias("dup_tokens"),
        F.max(span_len).cast("long").alias("longest_span"),
    )
    return stats.join(n_tok, "doc_id").select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "n_dup_spans",
        "dup_tokens",
        "longest_span",
        F.round(F.col("dup_tokens") * 1.0 / F.col("n_tokens"), 6).alias(
            "dup_fraction"
        ),
    )


@register(
    "substring_dedup_lcp",
    survey_ref="M5:dedup",
    oracle=_SUBSTR_LCP_ORACLE,
)
def q_substring_dedup_lcp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-dedup audit (Lee et al. 2022 semantics at
    threshold L=8 tokens): per document, the number of MAXIMAL
    duplicated regions (merged runs of L-token windows each of which
    occurs elsewhere in the corpus, or again in the same document),
    total duplicated tokens, the longest region, and the duplicated-
    token fraction — the number a curation pipeline thresholds on
    before training.

    Scale shape: one hash exchange keyed by the L-gram (the inherent
    substring-dedup shuffle; cf. the suffix-array SORT in the paper —
    hash partitioning is cheaper and skew-tolerant under AQE), then
    doc_id-co-partitioned windows for the interval merge and a final
    per-doc aggregate. Fact-scale data never meets a sort or an
    all-pairs join."""
    spans = _substring_dup_spans(spark, sf_dir)
    return _lcp_stats(spans, load_table(spark, sf_dir, "documents"))


@register(
    "substring_dedup_lcp_fast",
    survey_ref="M5:dedup",
    oracle=_SUBSTR_LCP_ORACLE,
)
def q_substring_dedup_lcp_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same answer as substring_dedup_lcp (same oracle, exact-hash),
    with the 100 TB shuffle-volume shape: the EVENT-SCALE exchange
    carries only the 64-bit xxhash64 gram fingerprint as a groupBy key
    (ints, map-side combinable to one row per distinct fingerprint per
    partition) instead of the ~10x-heavier gram string. Candidate
    positions — those whose fingerprint occurs more than once — join
    back against the (much smaller) duplicated-fingerprint list, and
    only THAT candidate subset pays a string-keyed recount, which
    removes any xxhash64 collision before it can fabricate a span.

    The dup-fingerprint join is left UNHINTED on purpose (the
    queries/tpch_ext.py mid-size-relation policy): at fixture scales
    the planner broadcasts it; on a boilerplate-heavy 100 TB corpus
    where the list outgrows broadcast, it shuffles on the 8-byte key —
    or degrades to the stored-bloom semijoin pattern
    (bloom_semijoin_reduction) if even that list is awkward."""
    grams = _doc_grams(spark, sf_dir)
    h = F.xxhash64("gram")
    dup_h = (
        grams.groupBy(h.alias("h"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
        .select("h")
    )
    cand = grams.withColumn("h", h).join(dup_h, "h")
    wg = Window.partitionBy("gram")
    dup = (
        cand.withColumn("cnt2", F.count(F.lit(1)).over(wg))
        .filter(F.col("cnt2") > 1)
        .select("doc_id", "p", (F.col("p") + _SUB_L - 1).alias("e"))
    )
    spans = _merge_spans(dup)
    return _lcp_stats(spans, load_table(spark, sf_dir, "documents"))


@register(
    "substring_dup_extract",
    survey_ref="M5:dedup",
    oracle=f"""
WITH {_SUBSTR_SPAN_CTE}
SELECT s.doc_id,
       CAST(span_start AS BIGINT) AS span_start,
       CAST(span_end AS BIGINT) AS span_end,
       CAST(span_end - span_start + 1 AS BIGINT) AS span_len,
       array_to_string(list_slice(tarr.t, span_start, span_end), ' ')
         AS span_text
FROM spans s JOIN tarr USING (doc_id)
ORDER BY span_len DESC, doc_id, span_start
LIMIT 20
""",
)
def q_substring_dup_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 longest duplicated REGIONS with their text — the audit
    view a curator eyeballs before committing a removal pass
    (boilerplate, licence blocks, navigation chrome surface here).
    A region is a maximal merged run of duplicated L-gram windows:
    every L-token window inside it occurs elsewhere, but when
    overlapping duplicate families have different extents the merged
    region's FULL text need not repeat verbatim anywhere — it marks
    removable ground, not necessarily one repeated string.

    Scale shape: spans (already tiny relative to the corpus) re-join
    the token arrays on doc_id to materialize the span text, then a
    TakeOrderedAndProject top-k — no global sort of the span table."""
    spans = _substring_dup_spans(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    tarr = d.select("doc_id", F.split("text", " ").alias("t"))
    span_len = (F.col("span_end") - F.col("span_start") + 1).cast("long")
    return (
        spans.join(tarr, "doc_id")
        .select(
            "doc_id",
            F.col("span_start").cast("long").alias("span_start"),
            F.col("span_end").cast("long").alias("span_end"),
            span_len.alias("span_len"),
            F.concat_ws(
                " ",
                F.slice(
                    F.col("t"),
                    F.col("span_start"),
                    F.col("span_end") - F.col("span_start") + 1,
                ),
            ).alias("span_text"),
        )
        .orderBy(F.desc("span_len"), F.asc("doc_id"), F.asc("span_start"))
        .limit(20)
    )


def _excise_covered(d: DataFrame, spans: DataFrame) -> DataFrame:
    """Re-emit every document with the token positions covered by
    ``spans`` removed, plus the removed count. ``spans`` must be
    per-doc DISJOINT (the _merge_spans invariant: a new island starts
    only past the running max end + 1 — coverage contiguity), so the
    exploded (doc_id, pos) rows are already unique — no distinct, no
    extra exchange.

    Scale shape: covered positions are bounded by removed tokens (not
    corpus size), the left join against the token stream hash-
    partitions both sides on doc_id, and re-assembly is an order-
    stable aggregate (array_sort over (pos, tok) structs — no sort
    shuffle; DuckDB mirrors it with STRING_AGG ... ORDER BY)."""
    covered = spans.select(
        "doc_id",
        F.explode(F.sequence(F.col("span_start"), F.col("span_end"))).alias("pos"),
        F.lit(1).alias("is_cov"),
    )
    tokpos = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    joined = tokpos.join(covered, ["doc_id", "pos"], "left")
    kept_struct = F.when(
        F.col("is_cov").isNull(), F.struct(F.col("pos"), F.col("tok"))
    )
    return joined.groupBy("doc_id").agg(
        F.coalesce(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["tok"],
                ),
                " ",
            ),
            F.lit(""),
        ).alias("clean_text"),
        F.sum(F.when(F.col("is_cov").isNull(), 0).otherwise(1))
        .cast("long")
        .alias("n_removed"),
    )


@register(
    "substring_dedup_clean",
    survey_ref="M5:dedup",
    oracle=f"""
WITH {_SUBSTR_SPAN_CTE},{_SQL_EXCISE_TAIL}
""",
)
def q_substring_dedup_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The conservative removal pass: re-emit every document with ALL
    duplicated >=L-token regions excised (every occurrence goes — the
    policy for contamination scrubbing, where no copy may survive)
    plus the removed-token count. The keep-one variant is
    substring_dedup_keep_first."""
    spans = _substring_dup_spans(spark, sf_dir)
    return _excise_covered(load_table(spark, sf_dir, "documents"), spans)


@register(
    "substring_dedup_keep_first",
    survey_ref="M5:dedup",
    oracle=f"""
WITH {SUBSTR_GRAM_CTE},
rem AS (
  SELECT doc_id, p, p + {_SUB_L - 1} AS e
  FROM (SELECT doc_id, p,
               ROW_NUMBER() OVER (PARTITION BY gram
                                  ORDER BY doc_id, p) AS rk
        FROM grams) g
  WHERE rk > 1
),{_sql_islands("rem")},{_SQL_EXCISE_TAIL}
""",
)
def q_substring_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PAPER's removal policy (Lee et al. 2022 §3, drop all but
    one occurrence), applied at gram granularity: a token position is
    excised iff it is covered by an L-gram window whose gram has an
    EARLIER occurrence in corpus order (doc_id, p). The first
    occurrence of every duplicated gram stays in place — a document
    consisting of first occurrences is untouched, later copies of
    boilerplate disappear. Where shifted duplicate families overlap,
    the union of later-occurrence windows is excised (the same
    span-union behavior as the paper's range removal); granularity at
    the gram rather than the merged-span level is what makes the
    policy well-defined when occurrences have different maximal
    extents in different documents.

    Scale shape: identical to the audit queries — one gram-keyed hash
    exchange (row_number instead of count over the same window), the
    doc_id-co-partitioned interval merge, and the bounded excise
    re-assembly shared with substring_dedup_clean."""
    grams = _doc_grams(spark, sf_dir)
    wk = Window.partitionBy("gram").orderBy("doc_id", "p")
    rem = (
        grams.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") > 1)
        .select("doc_id", "p", (F.col("p") + _SUB_L - 1).alias("e"))
    )
    return _excise_covered(
        load_table(spark, sf_dir, "documents"), _merge_spans(rem)
    )
