"""Corpus quality-signal queries — the signals a crawl-scale
pretraining pipeline attaches to documents before curation:

- ``z2_pagerank_purchase_graph`` — link-graph quality prior
  (PageRank; the customer↔supplier purchase graph stands in for the
  bipartite link structure)
- ``z2_cms_heavy_hitters`` — mergeable count-min sketch counts (the
  bounded-memory answer when the key space is unbounded; the
  streaming-maintained twin ``st_stream_cms_topk`` lives in
  q_streaming inside the driver window)
- ``z2_quality_logreg_score`` — fastText-style linear quality gate
  (one codegen map pass, no shuffle)
- ``z2_image_ahash_near_dup`` — perceptual image near-dup through
  the real PNG codec
- ``z2_unigram_cross_entropy`` — CCNet-style LM perplexity filter
- ``z2_repeated_ngram_spans`` — substring-level boilerplate dedup
  (Lee et al. shape)
- ``z2_audio_sig_near_dup`` — perceptual audio near-dup through the
  real WAV codec (block-energy signature)

No reference equivalent — extension surface.
Registered LAST (queries/__init__.py ordering policy).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sftp_data_ingestion_spark.ext.classify import logreg_margin
from sftp_data_ingestion_spark.ext.graph import (
    pagerank,
    pagerank_oracle_sql,
    triangle_counts,
    triangle_counts_oracle_sql,
)
from sftp_data_ingestion_spark.ext.sketch import (
    cms_build,
    cms_estimate,
    cms_topk_oracle_sql,
)
from sftp_data_ingestion_spark.queries.registry import ORACLES, query, table

# customer nodes are even ids, supplier nodes odd — disjoint spaces
_EDGE_BASE_SQL = (
    "SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst "
    "FROM orders JOIN lineitem ON o_orderkey = l_orderkey"
)
_EDGES_SQL = (
    f"SELECT src, dst FROM ({_EDGE_BASE_SQL}) "
    f"UNION ALL SELECT dst AS src, src AS dst FROM ({_EDGE_BASE_SQL})"
)


@query(
    "z2_pagerank_purchase_graph",
    oracle=pagerank_oracle_sql(_EDGES_SQL, iterations=5, damping=0.85),
)
def z2_pagerank_purchase_graph(spark, sf_dir):
    """PageRank over the bidirected customer↔supplier purchase graph
    (edge = "this customer bought from this supplier") — the
    domain-authority prior a crawl curation pipeline computes over
    its link graph, run on the warehouse's own relational data.

    Scale shape: the edge list derives from one orders⋈lineitem join
    and is checkpointed once; each of the 5 power-iteration steps is
    exactly one edges⋈ranks shuffle join plus one groupBy-sum — the
    canonical Pregel schedule (`ext/graph.py`), identical to how
    GraphX/GraphFrames schedule it, with `localCheckpoint` keeping
    the iterated plan constant-depth. Bidirected edges mean every
    node has out-degree >= 1, so no dangling-mass correction is
    needed and the unrolled 5-CTE DuckDB oracle is exact. Ranks are
    rounded to 8 dp — partial-sum order is the only cross-engine
    drift (~1e-17) — and ALL nodes are returned (no top-k cutoff,
    so rank ties cannot flip set membership between engines)."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    base = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = base.unionAll(base.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    ranks = pagerank(edges, iterations=5, damping=0.85)
    return ranks.select("node", F.round("rank", 8).alias("rank"))


_CMS_WIDTH, _CMS_DEPTH = 64, 4


@query(
    "z2_cms_heavy_hitters",
    oracle=cms_topk_oracle_sql(
        width=_CMS_WIDTH, depth=_CMS_DEPTH, include_overestimate=True
    ),
)
def z2_cms_heavy_hitters(spark, sf_dir):
    """Count-min sketch (depth 4 × width 64) over event user activity,
    point-estimated for the exact top-20 users. The sketch collapses
    to <= 256 counter rows via one map-side-combined groupBy — the
    shuffled intermediate is bounded by the GRID size per partition,
    not the input size, which is the whole point at 100 TB — and the
    probe joins against the broadcast 256-row sketch, never
    shuffling. The width is deliberately small so collisions occur
    and the one-sided error is visible: `overestimate` asserts the
    CMS guarantee (estimate >= truth, always) cell by cell. Portable
    multiplicative hashing makes the DuckDB twin bit-identical
    (`ext/sketch.py`)."""
    e = table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    sketch = cms_build(e, "user_id", width=_CMS_WIDTH, depth=_CMS_DEPTH)
    exact = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    # orderBy+limit compiles to TakeOrderedAndProject: each partition
    # keeps a 20-row heap and the driver merges heaps — no global
    # single-partition WindowExec over the full distinct-user
    # aggregate (billions of rows at 100 TB).
    top20 = exact.orderBy(
        F.col("exact_cnt").desc(), F.col("user_id").asc()
    ).limit(20)
    est = cms_estimate(
        sketch, top20, "user_id", width=_CMS_WIDTH, depth=_CMS_DEPTH
    )
    return (
        top20.join(est, "user_id")
        .select(
            "user_id",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") >= F.col("exact_cnt")).alias("overestimate"),
        )
    )


# fastText-style fixed scorer: weights a trained model would ship with
_QW = {"bias": -1.5, "len_k": 0.9, "tok_h": 0.7, "upper": -2.0}


@query(
    "z2_quality_logreg_score",
    oracle=f"""
SELECT doc_id,
       round({_QW['bias']} + {_QW['len_k']} * (n_chars / 1000.0)
             + {_QW['tok_h']} * (len(string_split(text, ' ')) / 100.0)
             + {_QW['upper']}
               * (length(regexp_replace(text, '[^A-Z]', '', 'g'))
                  / CAST(greatest(n_chars, 1) AS DOUBLE)), 6) AS margin,
       ({_QW['bias']} + {_QW['len_k']} * (n_chars / 1000.0)
             + {_QW['tok_h']} * (len(string_split(text, ' ')) / 100.0)
             + {_QW['upper']}
               * (length(regexp_replace(text, '[^A-Z]', '', 'g'))
                  / CAST(greatest(n_chars, 1) AS DOUBLE))) > 0 AS keep
FROM documents
""",
)
def z2_quality_logreg_score(spark, sf_dir):
    """Linear (fastText-style) document quality gate: margin =
    bias + w·(kilochars, hectotokens, uppercase ratio), keep iff
    margin > 0. Scoring is a single map-only codegen pass — no UDF,
    no shuffle, filters and projection push straight to the parquet
    scan — so a 100 TB corpus scores at IO speed. The margin fold is
    strictly left-to-right (`ext/classify.py::logreg_margin`), making
    every intermediate double bit-identical across engines; the 6 dp
    round is belt-and-braces. Training the weights is `fit_logreg`
    (distributed full-batch GD, one d+2-double aggregate per pass),
    graded by convergence tests in `tests/test_signals.py`."""
    d = table(spark, sf_dir, "documents")
    feats = [
        (F.col("n_chars") / F.lit(1000.0)),
        (F.size(F.split(F.col("text"), " ")) / F.lit(100.0)),
        (
            F.length(F.regexp_replace(F.col("text"), "[^A-Z]", ""))
            / F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
        ),
    ]
    m = logreg_margin(
        feats, [_QW["len_k"], _QW["tok_h"], _QW["upper"]], _QW["bias"]
    )
    return d.select(
        "doc_id", F.round(m, 6).alias("margin"), (m > 0).alias("keep")
    )


# 64-bit signature packing + brute-force Hamming pair join — shared
# verbatim by the image and audio perceptual oracles so the bit
# layout can never drift between them (same rationale as
# cms_topk_oracle_sql). Banding on the Spark side is provably
# lossless at distance <= 3, so brute force here grades it exactly.
_SIG64_PAIRS_TAIL = """hashes AS (
  SELECT media_id,
    CAST(list_sum(list_transform(range(32), i ->
      CASE WHEN bs[i + 33] * 64 > total
           THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT) AS h_hi,
    CAST(list_sum(list_transform(range(32), i ->
      CASE WHEN bs[i + 1] * 64 > total
           THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT) AS h_lo
  FROM blocks
)
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.h_hi, b.h_hi))
            + bit_count(xor(a.h_lo, b.h_lo)) AS INTEGER) AS dist
FROM hashes a JOIN hashes b ON a.media_id < b.media_id
WHERE bit_count(xor(a.h_hi, b.h_hi)) + bit_count(xor(a.h_lo, b.h_lo)) <= 3
"""

# both perceptual oracles replay the codec arithmetic per CHARACTER
# (ascii()), the kernels per UTF-8 BYTE — equal only on ASCII text,
# so both engines filter to the ASCII-only corpus (bytes==codepoints)
# with the same regex; the kernels themselves are total over any
# bytes.
_ASCII_ONLY_SQL = "regexp_matches(text, '^[\\x00-\\x7f]*$')"
_ASCII_ONLY_RE = "^[\\x00-\\x7F]*$"

_AHASH_ORACLE = """
WITH imgs AS (
  SELECT doc_id AS media_id, text FROM documents
  WHERE doc_id % 3 = 0 AND length(text) > 0 AND {ascii}
  UNION ALL
  SELECT doc_id + 10000000 AS media_id,
         upper(substr(text, 1, 1)) || substr(text, 2) AS text
  FROM documents
  WHERE doc_id % 3 = 0 AND length(text) > 0 AND {ascii}
),
lumas AS (
  SELECT media_id,
    list_transform(range(256), i ->
      (299 * ascii(substr(text, ((3*i) % length(text)) + 1, 1))
     + 587 * ascii(substr(text, ((3*i+1) % length(text)) + 1, 1))
     + 114 * ascii(substr(text, ((3*i+2) % length(text)) + 1, 1))) // 1000
    ) AS px
  FROM imgs
),
blocks AS (
  SELECT media_id,
    list_transform(range(64), b ->
        px[((b // 8) * 2 + 0) * 16 + (b % 8) * 2 + 1]
      + px[((b // 8) * 2 + 0) * 16 + (b % 8) * 2 + 2]
      + px[((b // 8) * 2 + 1) * 16 + (b % 8) * 2 + 1]
      + px[((b // 8) * 2 + 1) * 16 + (b % 8) * 2 + 2]
    ) AS bs,
    list_sum(px) AS total
  FROM lumas
),
""" + _SIG64_PAIRS_TAIL
_AHASH_ORACLE = _AHASH_ORACLE.format(ascii=_ASCII_ONLY_SQL)


@query("z2_image_ahash_near_dup", oracle=_AHASH_ORACLE)
def z2_image_ahash_near_dup(spark, sf_dir):
    """Perceptual image near-duplicate detection through the REAL PNG
    codec: every third document's bytes become a 16x16 image, a
    retouched copy (first character upper-cased — a ≤32-luma dent in
    a handful of pixels) is planted beside it, and pairs are found by
    average-hash signatures within Hamming distance 3.

    The Spark path exercises the production pipeline end-to-end —
    zlib/Paeth PNG encode, the stdlib decode path, BT.601 luma, 8x8
    integer block-mean hash (`ext/multimodal.text_png_ahash`), then a
    pigeonhole-banded self-join on 16-bit hash quarters
    (`ahash_near_dup_pairs`) so candidates never come from an
    all-pairs scan. The DuckDB oracle replays the hash with pure byte
    arithmetic on the text (PNG is lossless; the hash is all-integer,
    so equality is exact) and verifies pairs with a brute-force
    Hamming join — banding is provably lossless at distance <= 3
    (4 bands x 16 bits: 3 flipped bits cannot touch all 4 bands), so
    the two pair sets must match exactly."""
    from sftp_data_ingestion_spark.ext import multimodal as mm

    # empty text is excluded in BOTH engines: the oracle's byte
    # arithmetic tiles with `i % length(text)`, undefined at length 0
    # (the kernel itself substitutes a NUL byte and stays total)
    d = table(spark, sf_dir, "documents").where(
        (F.col("doc_id") % 3 == 0)
        & (F.length("text") > 0)
        & F.col("text").rlike(_ASCII_ONLY_RE)
    )
    orig = d.select(F.col("doc_id").alias("media_id"), "text")
    retouched = d.select(
        (F.col("doc_id") + 10000000).alias("media_id"),
        F.concat(
            F.upper(F.substring("text", 1, 1)),
            F.expr("substring(text, 2)"),
        ).alias("text"),
    )
    hashes = mm.text_png_ahash(orig.unionAll(retouched))
    return mm.ahash_near_dup_pairs(hashes, max_distance=3).select(
        "id_a", "id_b", F.col("dist").cast("int").alias("dist")
    )


@query(
    "z2_unigram_cross_entropy",
    oracle="""
WITH toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
  ) WHERE tok <> ''
),
counts AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
total AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM counts)
SELECT doc_id,
       round(AVG(-ln(cnt / (SELECT total FROM total))), 6) AS xent,
       CAST(COUNT(*) AS BIGINT) AS n_tokens
FROM toks JOIN counts USING (tok)
GROUP BY doc_id
""",
)
def z2_unigram_cross_entropy(spark, sf_dir):
    """Per-document cross-entropy under the corpus's own unigram LM —
    the CCNet-style perplexity filter that ranks documents by how
    "language-like" they are (gibberish and boilerplate land in the
    tails). Three stages, each the scale-correct shape: token counts
    by one map-side-combined groupBy; the corpus total as a one-row
    aggregate broadcast into the probability expression; a
    tokens⋈vocabulary shuffle join (the vocabulary of a 100 TB corpus
    is NOT broadcastable — this is deliberately a shuffle join, with
    AQE free to demote it when the vocab is small) and a final
    per-doc average. -ln(p) is computed identically in both engines
    (exact IEEE division, libm log within 1 ulp); the 6 dp round
    absorbs both log rounding and partial-sum order (~1e-13 worst
    case, 7 orders of magnitude inside the tolerance)."""
    d = table(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").cast("double").alias("total"))
    neg_log_p = -F.log(F.col("cnt") / F.col("total"))
    return (
        toks.join(counts, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.round(F.avg(neg_log_p), 6).alias("xent"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )


_BOILER = (
    "all rights reserved contact us for more information "
    "subscribe to our newsletter"
)


@query(
    "z2_repeated_ngram_spans",
    oracle=f"""
WITH docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 20000000 AS doc_id, '{_BOILER} ' || text AS text
  FROM documents WHERE doc_id % 5 = 0
),
arrs AS (SELECT doc_id, string_split(text, ' ') AS a FROM docs2),
sh AS (
  SELECT doc_id, unnest(list_transform(range(len(a) - 7), i ->
      {{'pos': i, 'g': md5(array_to_string(a[i+1:i+8], ' '))}}),
    recursive := true)
  FROM arrs WHERE len(a) >= 8
),
counts AS (SELECT g, COUNT(*) AS c FROM sh GROUP BY g),
rep AS (SELECT g FROM counts WHERE c >= 5),
flagged AS (SELECT doc_id, pos FROM sh JOIN rep USING (g)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL OR pos > lag(pos) OVER w + 8
              THEN 1 ELSE 0 END AS flag
  FROM flagged WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
grp AS (
  SELECT doc_id, pos,
         SUM(flag) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM isl
)
SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + 8 AS BIGINT) AS span_end,
       CAST(COUNT(*) AS BIGINT) AS n_grams
FROM grp GROUP BY doc_id, island
""",
)
def z2_repeated_ngram_spans(spark, sf_dir):
    """Substring-level dedup signal: maximal token spans covered by
    8-grams repeated >= 5 times corpus-wide (overlapping-or-touching
    windows merge; see `ext/dedup.repeated_ngram_spans`) — the
    boilerplate detector of Lee et al.-style training-data dedup, in
    its shuffle-friendly n-gram/position form
    (`ext/dedup.repeated_ngram_spans`). A 12-token boilerplate banner
    is planted onto every fifth document (100 copies), so the spans
    must pin exactly its interior 8-grams ([0, 12), 5 grams) on each
    planted doc; organic repeats in the fixture are graded
    identically by both engines. Scale: positions shuffle once keyed
    by gram md5 (shingle text never crosses the wire), the repeated
    set broadcasts back, and span merging is one gaps-and-islands
    window per doc."""
    from sftp_data_ingestion_spark.ext.dedup import repeated_ngram_spans

    d = table(spark, sf_dir, "documents")
    planted = d.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 20000000).alias("doc_id"),
        F.concat(F.lit(_BOILER + " "), F.col("text")).alias("text"),
    )
    corpus = d.select("doc_id", "text").unionAll(planted)
    return repeated_ngram_spans(corpus, n=8, min_repeats=5)


_AUDIO_SIG_ORACLE = """
WITH auds AS (
  SELECT doc_id AS media_id, text FROM documents
  WHERE doc_id % 3 = 1 AND length(text) > 0 AND {ascii}
  UNION ALL
  SELECT doc_id + 10000000 AS media_id,
         upper(substr(text, 1, 1)) || substr(text, 2) AS text
  FROM documents
  WHERE doc_id % 3 = 1 AND length(text) > 0 AND {ascii}
),
mags AS (
  SELECT media_id,
    list_transform(range(256), i ->
      abs((ascii(substr(text, (i % length(text)) + 1, 1)) - 128) * 256)
    ) AS m
  FROM auds
),
blocks AS (
  SELECT media_id,
    list_transform(range(64), b ->
      m[4*b + 1] + m[4*b + 2] + m[4*b + 3] + m[4*b + 4]) AS bs,
    list_sum(m) AS total
  FROM mags
),
""" + _SIG64_PAIRS_TAIL
_AUDIO_SIG_ORACLE = _AUDIO_SIG_ORACLE.format(ascii=_ASCII_ONLY_SQL)


@query("z2_audio_sig_near_dup", oracle=_AUDIO_SIG_ORACLE)
def z2_audio_sig_near_dup(spark, sf_dir):
    """Perceptual AUDIO near-duplicate detection through the real WAV
    codec — the audio twin of `z2_image_ahash_near_dup`, closing the
    perceptual-dedup story across both decodable modalities. Every
    third document's bytes become 256 int16 PCM samples round-tripped
    through a real RIFF/WAVE encode/decode
    (`ext/multimodal.text_wav_ahash`), reduced to a 64-bit block-
    energy signature (all-integer: block magnitude sum vs global
    mean, cross-multiplied), and a retouched copy (first character
    upper-cased — a one-sample dent) is planted beside each original.
    Pairs come from the same pigeonhole-banded self-join as the image
    path (`ahash_near_dup_pairs` is signature-agnostic); the oracle
    replays the signature with pure byte arithmetic and brute-force
    Hamming, which banding provably reproduces at distance <= 3."""
    from sftp_data_ingestion_spark.ext import multimodal as mm

    d = table(spark, sf_dir, "documents").where(
        (F.col("doc_id") % 3 == 1)
        & (F.length("text") > 0)
        & F.col("text").rlike(_ASCII_ONLY_RE)
    )
    orig = d.select(F.col("doc_id").alias("media_id"), "text")
    retouched = d.select(
        (F.col("doc_id") + 10000000).alias("media_id"),
        F.concat(
            F.upper(F.substring("text", 1, 1)),
            F.expr("substring(text, 2)"),
        ).alias("text"),
    )
    hashes = mm.text_wav_ahash(orig.unionAll(retouched))
    return mm.ahash_near_dup_pairs(hashes, max_distance=3).select(
        "id_a", "id_b", F.col("dist").cast("int").alias("dist")
    )


@query(
    "z2_token_rle_udtf",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(
    list_transform(range(len(parts)), i ->
      {'pos': i, 'tok': parts[i + 1]}),
    recursive := true)
  FROM (
    SELECT doc_id,
           list_filter(string_split(text, ' '), t -> t <> '') AS parts
    FROM documents
  )
),
flagged AS (
  SELECT doc_id, pos, tok,
         CASE WHEN lag(tok) OVER w IS DISTINCT FROM tok
              THEN 1 ELSE 0 END AS new_run
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
runs AS (
  SELECT doc_id, pos, tok,
         SUM(new_run) OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
  FROM flagged
)
SELECT doc_id, CAST(MIN(pos) AS INTEGER) AS start_pos,
       MIN(tok) AS token, CAST(COUNT(*) AS INTEGER) AS run_len
FROM runs GROUP BY doc_id, run_id
""",
)
def z2_token_rle_udtf(spark, sf_dir):
    """Run-length encoding of adjacent repeated tokens through
    Spark 4's Python UDTF API — the one user-defined surface (scalar
    UDF / pandas UDF / applyInPandas UDAF / UDTF) the engine had not
    yet exercised, doing a job that genuinely wants sequential state:
    stuck-token repetition spans ("a a a a") are a standard
    generation/OCR artifact a corpus cleaner flags, and the UDTF
    walks each token stream once, carrying the current run — no
    window gymnastics, no shuffle (the LATERAL join expands rows
    in place, Arrow-batched, one Python worker per partition).
    The DuckDB oracle proves the same result the relational way:
    gaps-and-islands (lag + running sum + group), so the query also
    documents the equivalence of the two idioms."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="start_pos int, token string, run_len int")
    class TokenRuns:
        def eval(self, text: str):
            toks = [t for t in (text or "").split(" ") if t]
            if not toks:
                return
            start, cur = 0, toks[0]
            for i in range(1, len(toks)):
                if toks[i] != cur:
                    yield start, cur, i - start
                    start, cur = i, toks[i]
            yield start, cur, len(toks) - start

    spark.udtf.register("token_runs", TokenRuns)
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "udtf_docs"
    )
    return spark.sql(
        "SELECT d.doc_id, s.start_pos, s.token, s.run_len "
        "FROM udtf_docs d, LATERAL token_runs(d.text) s"
    )


@query(
    "z2_landing_source_roundtrip",
    oracle=None,  # set below: shares s6's oracle verbatim
)
def z2_landing_source_roundtrip(spark, sf_dir):
    """The S6 dirty-CSV fixture read through the PLUGGABLE PYTHON
    DATASOURCE instead of the grouped batch reader: one planner task
    per file, executor-side BOM strip + encoding detection
    (`io/landing_source.py`), then the identical Column-level parse
    (`csv_robust.parse_lines`) and header conformance. Graded against
    s6's oracle VERBATIM — same file, same expected rows — so any
    divergence between the two ingest paths (BOM handling, blank-row
    filtering, ragged repair) is a hash mismatch. This is the switch
    a user flips when the driver-side per-file sniff loop becomes the
    bottleneck; the rest of the pipeline is provably unchanged."""
    import os

    from sftp_data_ingestion_spark.io import landing_source as ls
    from sftp_data_ingestion_spark.io.csv_robust import (
        parse_lines,
        plan_file,
    )
    from sftp_data_ingestion_spark.operators.conform import conform_headers
    from sftp_data_ingestion_spark.queries.q_pipeline import write_s6_fixture

    path = write_s6_fixture(spark, sf_dir)
    plan = plan_file(path)  # sep/header contract (driver reads 1 head)
    ls.register(spark)
    lines = (
        spark.read.format("landing_text")
        .option("suffix", os.path.splitext(path)[1])
        .load(os.path.dirname(path))
        .select("value")
    )
    raw = parse_lines(lines, plan.sep, plan.header, plan.header_line)
    return conform_headers(raw).select(
        "id", "data_insercao", "pedido", "data_nfe", "valor_nfe", "peso",
        "qtd_volumes", "uf", "chave_nfe", "data_ultima_ocr", "status_prazo",
    )


# same fixture, same expectation: share s6's oracle text verbatim
ORACLES["z2_landing_source_roundtrip"] = ORACLES["s6_robust_csv_roundtrip"]


@query(
    "z2_variant_json",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS k_total,
       CAST(MAX(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS k_max
FROM events
WHERE json_valid(props)
GROUP BY event_type
""",
)
def z2_variant_json(spark, sf_dir):
    """Semi-structured aggregation through Spark 4's VARIANT type:
    `props` parses ONCE into the binary variant encoding
    (`try_parse_json` — invalid documents become NULL, not errors)
    and `try_variant_get` extracts typed fields with path syntax
    (NULL, not error, when a value can't cast — matching the oracle's
    TRY_CAST) — the
    engine-native replacement for per-expression `get_json_object`
    re-parsing (which tokenizes the JSON string once PER extraction;
    variant decodes once per row and serves every path from the
    binary form — the difference between O(paths) and O(1) parses on
    a wide extraction at 100 TB). The oracle aggregates the same
    fields via DuckDB's JSON functions; the variant path must agree
    after shredding."""
    e = table(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    k = F.try_variant_get(v, "$.k", "bigint")
    return (
        e.where(v.isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).alias("k_total"),
            F.max(k).alias("k_max"),
        )
    )


_CC_EDGES_SQL = """
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 2
  WHERE a.doc_id % 2 = 0
  UNION ALL
  SELECT a.doc_id, a.doc_id - 1
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id - 1
  WHERE a.doc_id % 10 = 5
"""


@query(
    "z2_cc_star_chain",
    oracle=f"""
WITH RECURSIVE edges AS ({_CC_EDGES_SQL}),
sym AS (
  SELECT id_a AS src, id_b AS dst FROM edges
  UNION ALL SELECT id_b, id_a FROM edges
),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT s.src, reach.r FROM sym s JOIN reach ON s.dst = reach.id
)
SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id
""",
)
def z2_cc_star_chain(spark, sf_dir):
    """Connected components by large-star/small-star contraction on a
    DERIVED high-diameter graph: the even doc_ids form one long chain
    (diameter ~n/2) with every doc_id ≡ 5 (mod 10) hanging off it,
    the rest singletons. This is the regime where the label
    propagation the near-dup families use (O(diameter) supersteps —
    fine for dedup cliques of diameter 2-3) refuses loudly at its
    iteration cap, while star contraction converges in O(log^2 n)
    rounds on ANY topology (~10 here for the 250-long chain; the
    comparative pytest pins that label propagation at max_iters=20
    gets this graph WRONG). Graded against the DuckDB recursive
    closure of the same derived edges."""
    from sftp_data_ingestion_spark.ext.graph import cc_star_contraction

    d = table(spark, sf_dir, "documents").select("doc_id")
    a = d.select(F.col("doc_id").alias("x"))
    b = d.select(F.col("doc_id").alias("y"))
    e1 = (
        a.where(F.col("x") % 2 == 0)
        .join(b, b.y == F.col("x") + 2)
        .select(F.col("x").alias("id_a"), F.col("y").alias("id_b"))
    )
    e2 = (
        a.where(F.col("x") % 10 == 5)
        .join(b, b.y == F.col("x") - 1)
        .select(F.col("x").alias("id_a"), F.col("y").alias("id_b"))
    )
    comp = cc_star_contraction(d, e1.unionAll(e2), id_col="doc_id")
    return comp.select(F.col("id").alias("doc_id"), "component")


_MK_STEP = """
c{L}{t} AS (
  SELECT list_transform(range(5), i ->
    CASE WHEN i = {r} THEN CAST(0.0 AS DOUBLE) ELSE
      round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        list_transform(range(5), j -> pl.pf[i*5 + j + 1] * p.v[j+1])),
        (a, b) -> a + b) + bl2.bf[i+1], 6) END) AS v
  FROM pl, bl2, c{L}{p} p
)"""


def _mk_chains():
    parts = []
    for label, r in (("f", -1), ("r1", 1), ("r2", 2), ("r3", 3), ("r4", 4)):
        parts.append(
            f"c{label}0 AS (SELECT list_transform(range(5), i ->"
            " CAST(0.0 AS DOUBLE)) AS v)"
        )
        for t in range(1, 31):
            parts.append(_MK_STEP.format(L=label, t=t, p=t - 1, r=r))
    return ",".join(parts)


@query(
    "z2_markov_attribution",
    oracle=f"""
WITH srt AS MATERIALIZED (
  -- the path column is NOT named "full": FULL is a reserved join
  -- keyword and DuckDB's parser rejects it unquoted in SELECT lists
  SELECT user_id,
         list(CASE WHEN event_type = 'purchase' THEN 'CONV'
                   ELSE event_type END ORDER BY ts, event_id) AS path
  FROM events GROUP BY user_id
), lst AS MATERIALIZED (
  SELECT list_prepend('START',
           CASE WHEN COALESCE(pos, 0) > 0
                THEN list_slice(path, 1, pos)
                ELSE list_append(path, 'NULL') END) AS l
  FROM (SELECT path, list_position(path, 'CONV') AS pos FROM srt)
), pr AS MATERIALIZED (
  SELECT l, unnest(range(length(l) - 1)) AS i FROM lst
), pairs AS MATERIALIZED (
  SELECT l[i+1] AS src, l[i+2] AS dst FROM pr
), cnt AS MATERIALIZED (SELECT src, dst, count(*) AS c FROM pairs GROUP BY 1, 2),
tots AS MATERIALIZED (SELECT src, sum(c) AS t FROM cnt GROUP BY 1),
sts(i, s) AS (
  SELECT * FROM (VALUES (0, 'START'), (1, 'click'), (2, 'error'),
                        (3, 'signup'), (4, 'view')) v(i, s)
), pm AS MATERIALIZED (
  SELECT a.i AS i, b2.i AS j,
         COALESCE(round(cnt.c * 1.0 / tots.t, 6), 0.0) AS p
  FROM sts a CROSS JOIN sts b2
  LEFT JOIN cnt ON cnt.src = a.s AND cnt.dst = b2.s
  LEFT JOIN tots ON tots.src = a.s
), pl AS MATERIALIZED (SELECT list(p ORDER BY i * 5 + j) AS pf FROM pm),
bm AS MATERIALIZED (
  SELECT a.i AS i, COALESCE(round(cnt.c * 1.0 / tots.t, 6), 0.0) AS b
  FROM sts a
  LEFT JOIN cnt ON cnt.src = a.s AND cnt.dst = 'CONV'
  LEFT JOIN tots ON tots.src = a.s
), bl2 AS MATERIALIZED (SELECT list(b ORDER BY i) AS bf FROM bm),
{_mk_chains()},
fin AS (
  SELECT f.v[1] AS p0, a.v[1] AS p1, b.v[1] AS p2,
         c.v[1] AS p3, d.v[1] AS p4
  FROM cf30 f, cr130 a, cr230 b, cr330 c, cr430 d
), re AS (
  SELECT round((p0 - p1) / p0, 6) AS e1, round((p0 - p2) / p0, 6) AS e2,
         round((p0 - p3) / p0, 6) AS e3, round((p0 - p4) / p0, 6) AS e4
  FROM fin
)
SELECT 'click' AS channel, e1 AS removal_effect,
       round(e1 / (e1 + e2 + e3 + e4), 6) AS share FROM re
UNION ALL SELECT 'error', e2, round(e2 / (e1 + e2 + e3 + e4), 6) FROM re
UNION ALL SELECT 'signup', e3, round(e3 / (e1 + e2 + e3 + e4), 6) FROM re
UNION ALL SELECT 'view', e4, round(e4 / (e1 + e2 + e3 + e4), 6) FROM re
""",
)
def z2_markov_attribution(spark, sf_dir):
    """Markov removal-effect attribution (Anderl et al. 2014) graded
    end-to-end: per-user journeys truncated at the first conversion,
    transition counts over START + 4 channels + CONV/NULL absorbers,
    the absorbing chain solved by 30 rounded fixed-point iterations,
    then re-solved with each channel pinned to zero — attribution is
    the normalized removal effect. The oracle replays the path build,
    the 6×6 probability matrix, and all FIVE chains (full + 4
    removals) to bit-equal shares. Distributed work is the path build
    + a (src, dst) groupBy; the solve touches a ≤6×6 matrix on the
    driver. EAGER at composition time (counts collect)."""
    from sftp_data_ingestion_spark.ext.graph import (
        markov_removal_attribution,
    )

    e = table(spark, sf_dir, "events")
    rows = markov_removal_attribution(e)
    return spark.createDataFrame(
        [(c, float(r), float(s)) for c, r, s in rows],
        "channel string, removal_effect double, share double",
    )


_TRI_EDGES_SQL = """
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY u, v
"""


@query(
    "z2_triangle_count",
    oracle=triangle_counts_oracle_sql(_TRI_EDGES_SQL),
)
def z2_triangle_count(spark, sf_dir):
    """Per-node triangle counts over the part co-purchase graph
    (edge = two parts appear in the same order) — the local
    clustering signal of link-graph analysis (spam/community
    structure in a crawl graph; cohesion in an entity graph).
    Degree-ordered orientation (`ext/graph.py:triangle_counts`)
    enumerates every wedge at its lowest-degree corner, bounding the
    intermediate at O(m^1.5) instead of O(Σ deg²) — on a power-law
    crawl graph at 100 TB that exponent difference is the whole
    game, and it's the same discipline as the salted-join family:
    never let the hot key own the schedule.

    Plan: edge derivation is one self-join on l_orderkey + distinct;
    degrees are a broadcast; the wedge+closure stage is two hash
    joins on the oriented edge list."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
    )
    return triangle_counts(edges)
